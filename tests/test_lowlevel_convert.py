"""Torch-oracle parity for the ``encoder_low_level`` checkpoint converter.

Builds a torch module with EXACTLY the reference's parameter layout
(``train_vae_latent_512_low_level_no_average.py:219-251``:
``subject_wise_linear.0`` + a flat ``upsampler`` Sequential of six
ConvTranspose2d(k=4,s=2,p=1)+BN+ReLU stages and two 1×1 head stages),
converts with ``convert_encoder_low_level``, and asserts eval-mode forward
parity with :class:`EncoderLowLevel` — pinning the ConvTranspose kernel-flip
and the SAME-padding ≡ (k=4,s=2,p=1) equivalence.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from eeg_image_decode_tpu.models.lowlevel import (
    EncoderLowLevel,
    convert_encoder_low_level,
)

N_CH, SEQ, PROJ = 4, 10, 8  # input channels 4·8 = 32
STAGES = (16, 8, 8, 8, 8, 8)


class _RefLowLevel(torch.nn.Module):
    """Reference-layout torch oracle (state-dict-key compatible)."""

    def __init__(self):
        super().__init__()
        self.subject_wise_linear = torch.nn.ModuleList(
            [torch.nn.Linear(SEQ, PROJ)]
        )
        # the real reference registers a logit_scale its low-level loss
        # never touches (train_...no_average.py:224); the exporter emits it
        # for strict loads, so the twin must carry it too
        import math

        self.logit_scale = torch.nn.Parameter(
            torch.ones([]) * math.log(1 / 0.07))
        layers = []
        in_ch = N_CH * PROJ
        for ch in STAGES:
            layers += [
                torch.nn.ConvTranspose2d(in_ch, ch, kernel_size=4, stride=2,
                                         padding=1),
                torch.nn.BatchNorm2d(ch),
                torch.nn.ReLU(inplace=True),
            ]
            in_ch = ch
        layers += [
            torch.nn.ConvTranspose2d(in_ch, 16, kernel_size=1, stride=1),
            torch.nn.BatchNorm2d(16),
            torch.nn.ReLU(inplace=True),
            torch.nn.ConvTranspose2d(16, 4, kernel_size=1, stride=1),
        ]
        self.upsampler = torch.nn.Sequential(*layers)

    def forward(self, x):
        x = self.subject_wise_linear[0](x)
        x = x.reshape(x.size(0), N_CH * PROJ, 1, 1)
        return self.upsampler(x)


def test_lowlevel_converter_forward_parity():
    torch.manual_seed(0)
    ref = _RefLowLevel().eval()
    # non-trivial running stats so eval-mode BN is actually exercised
    with torch.no_grad():
        ref.train()
        for _ in range(3):
            ref(torch.randn(6, N_CH, SEQ))
        ref.eval()

    variables = convert_encoder_low_level(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    model = EncoderLowLevel(n_channels=N_CH, seq_len=SEQ, time_proj_dim=PROJ,
                            stage_channels=STAGES)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, N_CH, SEQ)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()  # NCHW
    got = np.asarray(model.apply(variables, jnp.asarray(x)))  # NHWC
    np.testing.assert_allclose(
        got, np.transpose(want, (0, 2, 3, 1)), atol=1e-4, rtol=1e-4
    )


def test_export_roundtrip_lowlevel():
    """export_encoder_low_level inverts the importer bit-for-bit and the
    exported dict loads back into the torch reference module with an
    identical forward — reverse migration for trained low-level encoders."""
    from eeg_image_decode_tpu.models.lowlevel import export_encoder_low_level

    torch.manual_seed(2)
    ref = _RefLowLevel().eval()
    with torch.no_grad():
        ref.train()
        ref(torch.randn(4, N_CH, SEQ))
        ref.eval()
    sd0 = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_encoder_low_level(sd0)
    sd1 = export_encoder_low_level(variables)

    assert set(sd1) == set(sd0), set(sd1) ^ set(sd0)
    for k in sd0:
        if k.endswith("num_batches_tracked"):
            continue  # re-emitted as 0 (not used in eval-mode BN)
        np.testing.assert_array_equal(sd1[k], np.asarray(sd0[k]), err_msg=k)

    ref2 = _RefLowLevel()
    ref2.load_state_dict({k: torch.tensor(v) for k, v in sd1.items()})
    ref2.eval()
    x = torch.tensor(
        np.random.default_rng(3).normal(size=(2, N_CH, SEQ))
        .astype(np.float32)
    )
    with torch.no_grad():
        np.testing.assert_array_equal(ref2(x).numpy(), ref(x).numpy())
