"""Low-level encoder: EEG → SDXL VAE latents (structural reconstruction).

Rebuilds ``encoder_low_level``
(``Generation/train_vae_latent_512_low_level_no_average.py:219-260``):
subject-wise Linear 250→128 over the time axis, reshape the (63·128)=8064
features to a 1×1 map, then a 7-stage ConvTranspose upsampler to the
(4, 64, 64) SDXL latent. NHWC + ``jax.lax.conv_transpose``; BN in fp32.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


class EncoderLowLevel(nn.Module):
    n_channels: int = 63
    seq_len: int = 250
    time_proj_dim: int = 128
    latent_channels: int = 4
    #: widths of the six 2×-upsampling stages (ref :229-248); shrink for tests
    stage_channels: tuple = (1024, 512, 256, 128, 64, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        subject_ids: jax.Array | None = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        del subject_ids  # the reference always indexes subject 0 (:258)
        h = nn.Dense(self.time_proj_dim, dtype=self.dtype,
                     name="subject_linear")(x.astype(self.dtype))
        h = h.reshape(h.shape[0], 1, 1, self.n_channels * self.time_proj_dim)

        # ConvTranspose ladder 1→2→4→8→16→32→64, then two 1×1 stages (ref
        # :228-251); channels 8064→1024→512→256→128→64→32→16→4
        for i, ch in enumerate(self.stage_channels):
            # SAME padding ≡ torch ConvTranspose2d(k=4, s=2, p=1): exact 2×
            h = nn.ConvTranspose(
                ch, kernel_size=(4, 4), strides=(2, 2), padding="SAME",
                dtype=self.dtype, name=f"up_{i}",
            )(h)
            # use_fast_variance=False: torch BN computes E[(x-mu)^2];
            # the fast E[x^2]-E[x]^2 form loses up to ~1e-4 relative var
            # to cancellation after deep ConvT chains, measurably widening
            # torch-trajectory deviation (scripts/parity_lowlevel_
            # trajectory.py)
            h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             use_fast_variance=False,
                             dtype=jnp.float32, name=f"bn_{i}")(h)
            h = nn.relu(h)
        h = nn.Conv(16, (1, 1), dtype=self.dtype, name="proj_16")(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         use_fast_variance=False,
                         dtype=jnp.float32, name="bn_proj")(h)
        h = nn.relu(h)
        return nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype,
                       name="proj_out")(h).astype(jnp.float32)


def convert_encoder_low_level(sd: dict) -> dict:
    """Reference ``encoder_low_level`` state dict → {"params", "batch_stats"}
    for :class:`EncoderLowLevel`.

    Torch layout (ref ``train_vae_latent_512_low_level_no_average.py:219-251``):
    ``subject_wise_linear.0`` Linear(250→128); ``upsampler.{0,3,6,9,12,15}``
    ConvTranspose2d(k=4,s=2,p=1) with BatchNorm2d at ``{1,4,7,10,13,16}``;
    ``upsampler.18`` ConvTranspose2d(32→16,k=1) + BN at ``.19``;
    ``upsampler.21`` ConvTranspose2d(16→4,k=1). A 1×1 ConvTranspose is a 1×1
    Conv, so the two head stages convert to the flax ``Conv`` modules.

    torch ConvTranspose2d weights are (in, out, kh, kw) and torch computes the
    *gradient-of-conv* (implicitly flipped kernel); flax ``nn.ConvTranspose``
    runs ``lax.conv_transpose`` with an unflipped HWIO kernel, so the spatial
    axes flip in the transpose stages. Parity is pinned against
    ``torch.nn.ConvTranspose2d`` in ``tests/test_lowlevel_convert.py``.
    """
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def convt(p):  # (in, out, kh, kw) → flipped (kh, kw, in, out)
        w = np.transpose(sd[f"{p}.weight"], (2, 3, 0, 1))[::-1, ::-1]
        return {"kernel": np.ascontiguousarray(w),
                "bias": sd[f"{p}.bias"]}

    def conv1x1(p):  # 1×1: no spatial extent, plain layout move
        return {"kernel": np.transpose(sd[f"{p}.weight"], (2, 3, 0, 1)),
                "bias": sd[f"{p}.bias"]}

    def bn(p):
        return (
            {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]},
            {"mean": sd[f"{p}.running_mean"], "var": sd[f"{p}.running_var"]},
        )

    params = {
        "subject_linear": {
            "kernel": sd["subject_wise_linear.0.weight"].T,
            "bias": sd["subject_wise_linear.0.bias"],
        },
    }
    stats = {}
    for i, idx in enumerate((0, 3, 6, 9, 12, 15)):
        params[f"up_{i}"] = convt(f"upsampler.{idx}")
        params[f"bn_{i}"], stats[f"bn_{i}"] = bn(f"upsampler.{idx + 1}")
    params["proj_16"] = conv1x1("upsampler.18")
    params["bn_proj"], stats["bn_proj"] = bn("upsampler.19")
    params["proj_out"] = conv1x1("upsampler.21")
    return {"params": params, "batch_stats": stats}


def export_encoder_low_level(variables: dict) -> dict:
    """:class:`EncoderLowLevel` variables → reference ``encoder_low_level``
    state-dict layout — the exact inverse of
    :func:`convert_encoder_low_level` (the spatial double-flip and every
    transpose are involutions), so a low-level encoder trained HERE loads
    straight into the reference's
    ``train_vae_latent_512_low_level_no_average.py:219-251`` module."""
    import jax

    v = jax.tree_util.tree_map(np.asarray, variables)
    p, stats = v["params"], v.get("batch_stats", {})
    sd: dict = {}

    def convt(name, leaf):  # flipped (kh, kw, in, out) → (in, out, kh, kw)
        w = np.asarray(leaf["kernel"])[::-1, ::-1]
        sd[f"{name}.weight"] = np.ascontiguousarray(
            np.transpose(w, (2, 3, 0, 1))
        )
        sd[f"{name}.bias"] = np.asarray(leaf["bias"])

    def conv1x1(name, leaf):
        sd[f"{name}.weight"] = np.ascontiguousarray(
            np.transpose(np.asarray(leaf["kernel"]), (2, 3, 0, 1))
        )
        sd[f"{name}.bias"] = np.asarray(leaf["bias"])

    def bn(name, affine, running):
        sd[f"{name}.weight"] = np.asarray(affine["scale"])
        sd[f"{name}.bias"] = np.asarray(affine["bias"])
        sd[f"{name}.running_mean"] = np.asarray(running["mean"])
        sd[f"{name}.running_var"] = np.asarray(running["var"])
        sd[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)

    # the reference class registers a logit_scale the low-level loss never
    # touches (train_ :224, assigned-but-unused at :296); AdamW skips
    # grad-less params, so it stays at its ln(1/0.07) init — emitted so
    # strict=True loads succeed
    sd["logit_scale"] = np.asarray(np.log(1.0 / 0.07), np.float32)
    sd["subject_wise_linear.0.weight"] = np.ascontiguousarray(
        np.asarray(p["subject_linear"]["kernel"]).T
    )
    sd["subject_wise_linear.0.bias"] = np.asarray(
        p["subject_linear"]["bias"]
    )
    for i, idx in enumerate((0, 3, 6, 9, 12, 15)):
        convt(f"upsampler.{idx}", p[f"up_{i}"])
        bn(f"upsampler.{idx + 1}", p[f"bn_{i}"], stats[f"bn_{i}"])
    conv1x1("upsampler.18", p["proj_16"])
    bn("upsampler.19", p["bn_proj"], stats["bn_proj"])
    conv1x1("upsampler.21", p["proj_out"])
    return sd
