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

import numpy as np

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

    class _SchedulerOutput:
        def __init__(self, prev_sample):
            self.prev_sample = prev_sample

    class DDPMScheduler:
        """diffusers ``DDPMScheduler()`` at stock settings, re-implemented
        at source fidelity (linear betas 1e-4→0.02 over 1000 steps,
        ε-prediction, fixed_small variance, clip_sample=True range 1.0) so
        the reference's ``Pipe.train``/``Pipe.generate`` run unmodified.
        ``inject_step_noise`` queues the ancestral-step variance draws for
        shared-trajectory sampling parity."""

        class config:
            num_train_timesteps = 1000

        def __init__(self):
            T = self.config.num_train_timesteps
            self.betas = torch.linspace(1e-4, 0.02, T, dtype=torch.float32)
            self.alphas = 1.0 - self.betas
            self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
            self.timesteps = torch.arange(T - 1, -1, -1)
            self.num_inference_steps = T
            self._noise_queue: list | None = None

        def inject_step_noise(self, noises):
            self._noise_queue = list(noises)

        def add_noise(self, original_samples, noise, timesteps):
            ac = self.alphas_cumprod.to(original_samples.device)[timesteps]
            while ac.dim() < original_samples.dim():
                ac = ac.unsqueeze(-1)
            return (ac.sqrt() * original_samples
                    + (1.0 - ac).sqrt() * noise)

        def set_timesteps(self, num_inference_steps, device=None):
            T = self.config.num_train_timesteps
            ratio = T // num_inference_steps
            ts = (np.arange(0, num_inference_steps) * ratio).round()[::-1]
            self.timesteps = torch.from_numpy(ts.copy().astype(np.int64))
            self.num_inference_steps = num_inference_steps

        def step(self, model_output, timestep, sample, generator=None):
            t = int(timestep)
            ratio = (self.config.num_train_timesteps
                     // self.num_inference_steps)
            prev_t = t - ratio
            ac_t = self.alphas_cumprod[t]
            ac_prev = (self.alphas_cumprod[prev_t] if prev_t >= 0
                       else torch.tensor(1.0))
            beta_prod_t = 1.0 - ac_t
            current_alpha = ac_t / ac_prev
            current_beta = 1.0 - current_alpha
            x0 = (sample - beta_prod_t.sqrt() * model_output) / ac_t.sqrt()
            x0 = x0.clamp(-1.0, 1.0)  # clip_sample=True default
            c0 = ac_prev.sqrt() * current_beta / beta_prod_t
            ct = current_alpha.sqrt() * (1.0 - ac_prev) / beta_prod_t
            mean = c0 * x0 + ct * sample
            if t > 0:
                var = ((1.0 - ac_prev) / beta_prod_t * current_beta).clamp(
                    min=1e-20)
                if self._noise_queue is not None:
                    noise = torch.as_tensor(self._noise_queue.pop(0),
                                            dtype=sample.dtype)
                else:
                    noise = torch.randn(sample.shape, generator=generator,
                                        dtype=sample.dtype)
                mean = mean + var.sqrt() * noise
            return _SchedulerOutput(mean)

    def get_cosine_schedule_with_warmup(optimizer, num_warmup_steps,
                                        num_training_steps, num_cycles=0.5,
                                        last_epoch=-1):
        """diffusers.optimization.get_cosine_schedule_with_warmup, exact
        formula (linear 0→1 over warmup, cosine 1→0 after)."""
        from torch.optim.lr_scheduler import LambdaLR

        def lr_lambda(current_step):
            if current_step < num_warmup_steps:
                return float(current_step) / float(max(1, num_warmup_steps))
            progress = (float(current_step - num_warmup_steps)
                        / float(max(1, num_training_steps
                                    - num_warmup_steps)))
            return max(0.0, 0.5 * (1.0 + math.cos(
                math.pi * float(num_cycles) * 2.0 * progress)))

        return LambdaLR(optimizer, lr_lambda, last_epoch)

    def retrieve_timesteps(scheduler, num_inference_steps=None, device=None,
                           timesteps=None, **kwargs):
        if timesteps is not None:
            scheduler.timesteps = timesteps
            return timesteps, len(timesteps)
        scheduler.set_timesteps(num_inference_steps, device=device)
        return scheduler.timesteps, num_inference_steps

    diffusers = _stub("diffusers")
    dmodels = _stub("diffusers.models")
    demb = _stub("diffusers.models.embeddings", Timesteps=Timesteps,
                 TimestepEmbedding=TimestepEmbedding)
    dmodels.embeddings = demb
    diffusers.models = dmodels
    _stub("diffusers.schedulers", DDPMScheduler=DDPMScheduler)
    _stub("diffusers.optimization",
          get_cosine_schedule_with_warmup=get_cosine_schedule_with_warmup)
    _stub("diffusers.pipelines")
    _stub("diffusers.pipelines.stable_diffusion_xl")
    _stub("diffusers.pipelines.stable_diffusion_xl."
          "pipeline_stable_diffusion_xl",
          retrieve_timesteps=retrieve_timesteps)
    _stub("diffusers", models=dmodels, DDPMScheduler=DDPMScheduler,
          AutoencoderKL=object)


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


def import_reference_lowlevel():
    """→ the executed module for
    Generation/train_vae_latent_512_low_level_no_average.py.

    That file loads the full SDXL pipeline AT MODULE LEVEL
    (``DiffusionPipeline.from_pretrained`` at :58) purely to hold a frozen
    VAE for training-time preview decodes; the shim pipeline carries an
    identity "VAE" so the module executes without weights/network and the
    preview branch (``:309-323``) stays a no-op. It also imports a
    ``layers`` package that does not exist anywhere in the reference repo
    (broken upstream import — the classes are never used by
    ``encoder_low_level``); stubbed likewise.
    """
    import torch
    import torch.nn as nn

    _install_common_shims()
    _install_diffusers_shim()

    class _Decoded:
        def __init__(self, sample):
            self.sample = sample

    class _FakeVAE(nn.Module):
        def decode(self, z):
            return _Decoded(z)

    class _FakePipe:
        vae = _FakeVAE()

    class _DiffusionPipeline:
        @staticmethod
        def from_pretrained(*a, **k):
            return _FakePipe()

    class _NoopImage:
        def save(self, *a, **k):
            pass

    class _VaeImageProcessor:
        def postprocess(self, x, output_type=None):
            return [_NoopImage() for _ in range(x.shape[0])]

    sys.modules["diffusers.pipelines.stable_diffusion_xl."
                "pipeline_stable_diffusion_xl"].DiffusionPipeline = (
        _DiffusionPipeline)
    _stub("diffusers.utils", load_image=None)
    _stub("diffusers.image_processor", VaeImageProcessor=_VaeImageProcessor)
    _stub("IPython")
    _stub("IPython.display", display=lambda *a, **k: None)
    _stub("eegdatasets_leaveone_latent_vae_no_average", EEGDataset=object)
    for name, attrs in (
        ("layers", {}),
        ("layers.Transformer_EncDec", dict(Encoder=object,
                                           EncoderLayer=object)),
        ("layers.SelfAttention_Family", dict(FullAttention=object,
                                             AttentionLayer=object)),
        ("layers.Embed", dict(DataEmbedding_inverted=object)),
    ):
        _stub(name, **attrs)
    return _load(
        f"{REFERENCE}/Generation/train_vae_latent_512_low_level_no_average.py",
        "_ref_lowlevel")
