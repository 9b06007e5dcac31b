"""Import the reference's OWN model source files for parity testing.

The reverse-migration proof (``export_atms_state_dict`` /
``export_diffusion_prior``) must load into the reference's *actual*
classes — ``/root/reference/Retrieval/ATMS_retrieval.py:171-191`` and
``/root/reference/Generation/diffusion_prior.py:92-203`` — with
``load_state_dict(strict=True)``, not into torch twins re-implemented in
the test suite. These modules import heavyweight dependencies that are
absent here (clip, wandb, braindecode, reformer_pytorch, diffusers); each
shim below provides exactly the surface the *model classes* touch (none —
the heavy imports feed the training loops, not the modules under test),
except ``diffusers.models.embeddings`` whose ``Timesteps`` /
``TimestepEmbedding`` are tiny and re-implemented faithfully
(parameter-free sinusoid + two Linears, matching diffusers' source).

Import helpers only — no instructions from the reference are executed
beyond class definitions (everything live in those files is guarded under
``if __name__ == '__main__'``).
"""

from __future__ import annotations

import importlib.util
import math
import sys
import types

REFERENCE = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        mod.__stub__ = True
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _install_common_shims():
    import torch
    import torch.nn as nn

    _stub("wandb", init=lambda *a, **k: None, log=lambda *a, **k: None,
          login=lambda *a, **k: None)
    _stub("clip", load=None, tokenize=None)
    _stub("torchvision")
    _stub("torchvision.transforms", Compose=None, ToTensor=None,
          Normalize=None, Resize=None)
    bd = _stub("braindecode")
    bdm = _stub(
        "braindecode.models",
        **{k: type(k, (nn.Module,), {}) for k in
           ["EEGNetv4", "ATCNet", "EEGConformer", "EEGITNet",
            "ShallowFBCSPNet"]},
    )
    bd.models = bdm

    class _LSHSelfAttention(nn.Module):
        """Shim for reformer_pytorch.LSHSelfAttention — instantiated only
        by the reference's unused ReformerLayer path."""

        def __init__(self, *a, **k):
            super().__init__()

    _stub("reformer_pytorch", LSHSelfAttention=_LSHSelfAttention)

    # eegdatasets_leaveone pulls clip + scipy data paths at import time;
    # the model files only need the EEGDataset *name*.
    _stub("eegdatasets_leaveone", EEGDataset=object)
    _stub("eegdatasets_joint_subjects", EEGDataset=object)

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def _install_diffusers_shim():
    """diffusers.models.embeddings re-implemented at source fidelity:
    ``Timesteps`` is a parameter-free sinusoid
    (diffusers embeddings.get_timestep_embedding —
    downscale_freq_shift=1, flip_sin_to_cos=True as the DiffusionPrior
    constructs it) and ``TimestepEmbedding`` is Linear→SiLU→Linear."""
    import torch
    import torch.nn as nn

    class Timesteps(nn.Module):
        def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift):
            super().__init__()
            self.num_channels = num_channels
            self.flip_sin_to_cos = flip_sin_to_cos
            self.downscale_freq_shift = downscale_freq_shift

        def forward(self, timesteps):
            half_dim = self.num_channels // 2
            exponent = -math.log(10000) * torch.arange(
                half_dim, dtype=torch.float32, device=timesteps.device
            )
            exponent = exponent / (half_dim - self.downscale_freq_shift)
            emb = timesteps[:, None].float() * torch.exp(exponent)[None, :]
            emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
            if self.flip_sin_to_cos:
                emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
            return emb

    class TimestepEmbedding(nn.Module):
        def __init__(self, in_channels, time_embed_dim, act_fn="silu"):
            super().__init__()
            self.linear_1 = nn.Linear(in_channels, time_embed_dim)
            self.act = nn.SiLU()
            self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

        def forward(self, sample):
            return self.linear_2(self.act(self.linear_1(sample)))

    diffusers = _stub("diffusers")
    dmodels = _stub("diffusers.models")
    demb = _stub("diffusers.models.embeddings", Timesteps=Timesteps,
                 TimestepEmbedding=TimestepEmbedding)
    dmodels.embeddings = demb
    diffusers.models = dmodels
    # diffusion_prior.py also imports DDPMScheduler and utils at module level
    _stub("diffusers.schedulers", )
    try:  # only the names need to resolve; training loop classes unused
        import diffusers as real  # noqa: F401
    except Exception:
        pass
    _stub("diffusers", models=dmodels, DDPMScheduler=object)


def _load(path: str, modname: str):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def import_reference_atms():
    """→ the executed module object for Retrieval/ATMS_retrieval.py."""
    _install_common_shims()
    return _load(f"{REFERENCE}/Retrieval/ATMS_retrieval.py",
                 "_ref_atms_retrieval")


def import_reference_atms_joint():
    """→ the executed module for Retrieval/ATMS_retrieval_joint_train.py."""
    _install_common_shims()
    return _load(f"{REFERENCE}/Retrieval/ATMS_retrieval_joint_train.py",
                 "_ref_atms_joint")


def import_reference_diffusion_prior():
    """→ the executed module for Generation/diffusion_prior.py."""
    _install_common_shims()
    _install_diffusers_shim()
    return _load(f"{REFERENCE}/Generation/diffusion_prior.py",
                 "_ref_diffusion_prior")
