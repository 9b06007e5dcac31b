"""Encoder registry and the contrastive wrapper.

The reference instantiates each encoder class ad hoc per script and hangs
``logit_scale`` + ``loss_func`` off every model (e.g.
``Retrieval/contrast_retrieval.py:110-117``). Here every encoder is a flax
module mapping ``(B, C, T) [, subject_ids] → (B, 1024)`` and the trainable
temperature lives in one shared wrapper.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from eeg_image_decode_tpu.core.config import ATMSConfig
from eeg_image_decode_tpu.models.layers import LogitScale


class ContrastiveModel(nn.Module):
    """encoder + raw trainable logit scale (init ln(1/0.07), used without exp
    — reference quirk, see ``losses/clip_loss.py``)."""

    encoder: nn.Module
    logit_scale_init: float = 2.6592600225  # ln(1/0.07)
    apply_exp: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        subject_ids: jax.Array | None = None,
        *,
        deterministic: bool = True,
        dropout_masks: dict | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        # dropout_masks only forwards when supplied — the mask-injection
        # parity hook is ATMS-only (see models/atm_s.py); other encoders
        # keep their plain signature
        kw = {} if dropout_masks is None else {"dropout_masks": dropout_masks}
        feats = self.encoder(
            x, subject_ids, deterministic=deterministic, **kw
        )
        scale = LogitScale(
            init_value=self.logit_scale_init, apply_exp=self.apply_exp,
            name="logit_scale",
        )()
        return feats, scale


def _build_atms(dtype, **kw) -> nn.Module:
    from eeg_image_decode_tpu.models.atm_s import ATMS

    cfg = kw.pop("config", None) or ATMSConfig(**kw)
    return ATMS(cfg, dtype=dtype)


def _build_nice(dtype, **kw) -> nn.Module:
    from eeg_image_decode_tpu.models.nice import NICE

    return NICE(dtype=dtype, **kw)


def _build_eegnetv4(dtype, **kw) -> nn.Module:
    from eeg_image_decode_tpu.models.eegnetv4 import EEGNetV4

    return EEGNetV4(dtype=dtype, **kw)


def _build_atme(dtype, **kw) -> nn.Module:
    from eeg_image_decode_tpu.models.atm_e import ATME

    return ATME(dtype=dtype, **kw)


def _build_mlp(dtype, **kw) -> nn.Module:
    from eeg_image_decode_tpu.models.baselines import MLPProjector

    return MLPProjector(dtype=dtype, **kw)


def _build_shallownet(dtype, **kw) -> nn.Module:
    from eeg_image_decode_tpu.models.baselines import ShallowFBCSPNet

    return ShallowFBCSPNet(dtype=dtype, **kw)


def _build_conformer(dtype, **kw) -> nn.Module:
    from eeg_image_decode_tpu.models.baselines import EEGConformer

    return EEGConformer(dtype=dtype, **kw)


def _build_meta_eeg(dtype, **kw) -> nn.Module:
    from eeg_image_decode_tpu.models.baselines import MetaEEG

    return MetaEEG(dtype=dtype, **kw)


def _build_atcnet(dtype, **kw) -> nn.Module:
    from eeg_image_decode_tpu.models.baselines import ATCNet

    return ATCNet(dtype=dtype, **kw)


def _build_eegitnet(dtype, **kw) -> nn.Module:
    from eeg_image_decode_tpu.models.baselines import EEGITNet

    return EEGITNet(dtype=dtype, **kw)


ENCODERS: dict[str, Callable[..., nn.Module]] = {
    "atms": _build_atms,
    "nice": _build_nice,
    "eegnetv4": _build_eegnetv4,
    "atme": _build_atme,
    "mlp": _build_mlp,
    "shallowfbcspnet": _build_shallownet,
    "eegconformer": _build_conformer,
    "metaeeg": _build_meta_eeg,
    "atcnet": _build_atcnet,
    "eegitnet": _build_eegitnet,
}

#: encoders whose reference counterpart uses logit_scale init ln(1/0.01)
#: (``contrast_retrieval.py:271,410``)
_SCALE_001 = {"mlp", "metaeeg"}


def build_encoder(
    name: str,
    *,
    dtype: jnp.dtype = jnp.float32,
    wrap: bool = True,
    **kwargs,
) -> nn.Module:
    """Build an encoder by name; ``wrap=True`` adds the logit-scale wrapper."""
    key = name.lower().replace("-", "").replace("_", "")
    if key not in ENCODERS:
        raise KeyError(f"unknown encoder '{name}'; have {sorted(ENCODERS)}")
    enc = ENCODERS[key](dtype, **kwargs)
    if not wrap:
        return enc
    init = float(jnp.log(1 / 0.01)) if key in _SCALE_001 else 2.6592600225
    return ContrastiveModel(encoder=enc, logit_scale_init=init)
