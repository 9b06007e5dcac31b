"""Inference-only vision backbones for the reconstruction-metric table.

The reference's metric notebook pulls four torchvision/hub CNNs as frozen
feature extractors (``Generation/Reconstruction_Metrics_ATM.ipynb``):

- AlexNet ``features.4`` / ``features.11`` → 2-way rows (cell 14)
- InceptionV3 ``avgpool`` → 2-way row (cell 16)
- EfficientNet-B1 ``avgpool`` → correlation-distance row (cell 20)
- SwAV ResNet-50 ``avgpool`` → correlation-distance row (cell 22)

(The CLIP ViT-L/14 row reuses ``models/clip_vit.py``.) Here each backbone is
a small NHWC flax module with an exact converter from the torchvision-naming
state_dict, so the whole metric table runs on TPU with converted weights and
no torchvision dependency. BatchNorms are frozen (inference statistics
folded at apply time), matching ``model.eval()``.

All extractors take [0, 1] RGB NHWC images; ``imagenet_preprocess`` applies
the notebook's Resize(shorter-side, bilinear) + ImageNet normalization (the
notebook skips center-crop because generated images are square).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def imagenet_preprocess(images: jax.Array, size: int) -> jax.Array:
    """[0,1] NHWC → resized (size×size, bilinear) + ImageNet-normalized."""
    b = images.shape[0]
    if images.shape[1] != size or images.shape[2] != size:
        images = jax.image.resize(images, (b, size, size, 3), "bilinear")
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (images.astype(jnp.float32) - mean) / std


class FrozenBN(nn.Module):
    """Inference BatchNorm: running statistics are plain params (converted
    from the torch checkpoint), never updated."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


def _max_pool(x, window=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), "VALID",
    )


def _avg_pool_3x3_same(x):
    """torch avg_pool2d(3, stride=1, padding=1, count_include_pad=True)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / 9.0


# ————————————————————————————— AlexNet —————————————————————————————


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet ``features`` trunk → {'f4', 'f11'} activations
    (ReLU after conv-2 / conv-5, the notebook's return_nodes)."""

    @nn.compact
    def __call__(self, x) -> dict[str, jax.Array]:
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    name="conv0")(x)
        x = nn.relu(x)
        x = _max_pool(x)
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), name="conv3")(x)
        f4 = nn.relu(x)
        x = _max_pool(f4)
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), name="conv6")(x)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv8")(x)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv10")(x)
        f11 = nn.relu(x)
        return {"f4": f4, "f11": f11}


def convert_alexnet(sd: dict) -> dict:
    """torchvision ``alexnet`` state_dict (``features.{i}.weight/bias``)."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def conv(i):
        return {
            "kernel": np.transpose(sd[f"features.{i}.weight"], (2, 3, 1, 0)),
            "bias": sd[f"features.{i}.bias"],
        }

    return {f"conv{i}": conv(i) for i in (0, 3, 6, 8, 10)}


# ————————————————————————————— ResNet-50 (SwAV) —————————————————————————————


class _ConvBN(nn.Module):
    features: int
    kernel: tuple[int, int] = (1, 1)
    strides: tuple[int, int] = (1, 1)
    padding: int = 0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        p = self.padding
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=((p, p), (p, p)), use_bias=False, name="conv")(x)
        return FrozenBN(eps=self.eps, name="bn")(x)


class _Bottleneck(nn.Module):
    width: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.relu(_ConvBN(self.width, name="a")(x))
        out = nn.relu(_ConvBN(self.width, (3, 3), (self.stride, self.stride),
                              padding=1, name="b")(out))
        out = _ConvBN(self.width * 4, name="c")(out)
        if self.downsample:
            identity = _ConvBN(self.width * 4,
                               strides=(self.stride, self.stride),
                               name="down")(x)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    """torchvision-layout ResNet-50 (v1.5: stride on the 3×3) through
    ``avgpool`` → (B, 2048). SwAV's released resnet50 uses this exact
    trunk."""

    @nn.compact
    def __call__(self, x) -> jax.Array:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = nn.relu(FrozenBN(name="bn1")(x))
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
        for li, (width, blocks, stride) in enumerate(
            ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)), start=1
        ):
            for bi in range(blocks):
                x = _Bottleneck(
                    width,
                    stride=stride if bi == 0 else 1,
                    downsample=bi == 0,
                    name=f"layer{li}_{bi}",
                )(x)
        return x.mean(axis=(1, 2))  # adaptive avgpool 1×1


def convert_resnet50(sd: dict) -> dict:
    """torchvision/SwAV ``resnet50`` state_dict → :class:`ResNet50` params.
    (SwAV hub checkpoints use torchvision naming; the fc/projection heads
    are ignored.)"""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def conv(p):
        return {"kernel": np.transpose(sd[f"{p}.weight"], (2, 3, 1, 0))}

    def bn(p):
        return {
            "scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"],
            "mean": sd[f"{p}.running_mean"], "var": sd[f"{p}.running_var"],
        }

    params = {"conv1": conv("conv1"), "bn1": bn("bn1")}
    for li, blocks in enumerate((3, 4, 6, 3), start=1):
        for bi in range(blocks):
            p = f"layer{li}.{bi}"
            entry = {
                "a": {"conv": conv(f"{p}.conv1"), "bn": bn(f"{p}.bn1")},
                "b": {"conv": conv(f"{p}.conv2"), "bn": bn(f"{p}.bn2")},
                "c": {"conv": conv(f"{p}.conv3"), "bn": bn(f"{p}.bn3")},
            }
            if f"{p}.downsample.0.weight" in sd:
                entry["down"] = {
                    "conv": conv(f"{p}.downsample.0"),
                    "bn": bn(f"{p}.downsample.1"),
                }
            params[f"layer{li}_{bi}"] = entry
    return params


# ————————————————————————————— InceptionV3 —————————————————————————————

_INCEPTION_EPS = 1e-3  # torchvision BasicConv2d: BatchNorm2d(eps=0.001)


class _BasicConv(nn.Module):
    features: int
    kernel: tuple[int, int] = (1, 1)
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        ph, pw = self.padding
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=((ph, ph), (pw, pw)), use_bias=False,
                    name="conv")(x)
        return nn.relu(FrozenBN(eps=_INCEPTION_EPS, name="bn")(x))


class _InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = _BasicConv(64, name="branch1x1")(x)
        b5 = _BasicConv(48, name="branch5x5_1")(x)
        b5 = _BasicConv(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = _BasicConv(64, name="branch3x3dbl_1")(x)
        b3 = _BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = _BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _BasicConv(self.pool_features, name="branch_pool")(
            _avg_pool_3x3_same(x)
        )
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class _InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _BasicConv(384, (3, 3), (2, 2), name="branch3x3")(x)
        bd = _BasicConv(64, name="branch3x3dbl_1")(x)
        bd = _BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = _BasicConv(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class _InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = _BasicConv(192, name="branch1x1")(x)
        b7 = _BasicConv(c7, name="branch7x7_1")(x)
        b7 = _BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = _BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = _BasicConv(c7, name="branch7x7dbl_1")(x)
        bd = _BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = _BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = _BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = _BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _BasicConv(192, name="branch_pool")(_avg_pool_3x3_same(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class _InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _BasicConv(192, name="branch3x3_1")(x)
        b3 = _BasicConv(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
        b7 = _BasicConv(192, name="branch7x7x3_1")(x)
        b7 = _BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = _BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = _BasicConv(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class _InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = _BasicConv(320, name="branch1x1")(x)
        b3 = _BasicConv(384, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            _BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = _BasicConv(448, name="branch3x3dbl_1")(x)
        bd = _BasicConv(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            _BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = _BasicConv(192, name="branch_pool")(_avg_pool_3x3_same(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """torchvision ``inception_v3`` through ``avgpool`` → (B, 2048).

    ``transform_input=True`` (the pretrained factory default): inputs are
    expected ImageNet-normalized and get remapped to the Inception [-1, 1]
    convention internally, exactly like torchvision."""

    transform_input: bool = True

    @nn.compact
    def __call__(self, x) -> jax.Array:
        if self.transform_input:
            ch = [
                x[..., i] * (IMAGENET_STD[i] / 0.5)
                + (IMAGENET_MEAN[i] - 0.5) / 0.5
                for i in range(3)
            ]
            x = jnp.stack(ch, axis=-1)
        x = _BasicConv(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
        x = _BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = _BasicConv(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = _BasicConv(80, name="Conv2d_3b_1x1")(x)
        x = _BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = _InceptionA(32, name="Mixed_5b")(x)
        x = _InceptionA(64, name="Mixed_5c")(x)
        x = _InceptionA(64, name="Mixed_5d")(x)
        x = _InceptionB(name="Mixed_6a")(x)
        x = _InceptionC(128, name="Mixed_6b")(x)
        x = _InceptionC(160, name="Mixed_6c")(x)
        x = _InceptionC(160, name="Mixed_6d")(x)
        x = _InceptionC(192, name="Mixed_6e")(x)
        x = _InceptionD(name="Mixed_7a")(x)
        x = _InceptionE(name="Mixed_7b")(x)
        x = _InceptionE(name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))


def convert_inception_v3(sd: dict) -> dict:
    """torchvision ``inception_v3`` state_dict → :class:`InceptionV3` params
    (AuxLogits/fc ignored)."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    params: dict = {}
    prefixes = {
        k.rsplit(".conv.weight", 1)[0]
        for k in sd if k.endswith(".conv.weight") and "AuxLogits" not in k
    }
    for p in prefixes:
        parts = p.split(".")
        node = params
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = {
            "conv": {
                "kernel": np.transpose(sd[f"{p}.conv.weight"], (2, 3, 1, 0))
            },
            "bn": {
                "scale": sd[f"{p}.bn.weight"],
                "bias": sd[f"{p}.bn.bias"],
                "mean": sd[f"{p}.bn.running_mean"],
                "var": sd[f"{p}.bn.running_var"],
            },
        }
    return params


# ————————————————————————————— EfficientNet-B1 —————————————————————————————

_EFFNET_EPS = 1e-5  # torchvision keeps BatchNorm2d defaults for B1

# (expand_ratio, channels, repeats, stride, kernel) per stage — B0 widths with
# B1's depth multiplier 1.1 already applied to the repeat counts
_EFFNET_B1_STAGES = (
    (1, 16, 2, 1, 3),
    (6, 24, 3, 2, 3),
    (6, 40, 3, 2, 5),
    (6, 80, 4, 2, 3),
    (6, 112, 4, 1, 5),
    (6, 192, 5, 2, 5),
    (6, 320, 2, 1, 3),
)


class _MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x):
        identity = x
        h = x
        mid = self.in_ch * self.expand
        if self.expand != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, name="expand_conv")(h)
            h = nn.silu(FrozenBN(eps=_EFFNET_EPS, name="expand_bn")(h))
        p = self.kernel // 2
        h = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), feature_group_count=mid,
                    use_bias=False, name="dw_conv")(h)
        h = nn.silu(FrozenBN(eps=_EFFNET_EPS, name="dw_bn")(h))
        # squeeze-excitation (squeeze channels = in_ch // 4)
        se = h.mean(axis=(1, 2), keepdims=True)
        se = nn.Conv(max(1, self.in_ch // 4), (1, 1), name="se_fc1")(se)
        se = nn.Conv(mid, (1, 1), name="se_fc2")(nn.silu(se))
        h = h * jax.nn.sigmoid(se)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="project_conv")(h)
        h = FrozenBN(eps=_EFFNET_EPS, name="project_bn")(h)
        if self.stride == 1 and self.in_ch == self.out_ch:
            h = h + identity  # StochasticDepth is identity in eval
        return h


class EfficientNetB1(nn.Module):
    """torchvision ``efficientnet_b1`` through ``avgpool`` → (B, 1280)."""

    @nn.compact
    def __call__(self, x) -> jax.Array:
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem_conv")(x)
        x = nn.silu(FrozenBN(eps=_EFFNET_EPS, name="stem_bn")(x))
        in_ch = 32
        for si, (t, c, n, s, k) in enumerate(_EFFNET_B1_STAGES, start=1):
            for bi in range(n):
                x = _MBConv(
                    in_ch, c, t, k, s if bi == 0 else 1,
                    name=f"stage{si}_{bi}",
                )(x)
                in_ch = c
        x = nn.Conv(1280, (1, 1), use_bias=False, name="head_conv")(x)
        x = nn.silu(FrozenBN(eps=_EFFNET_EPS, name="head_bn")(x))
        return x.mean(axis=(1, 2))


def convert_efficientnet_b1(sd: dict) -> dict:
    """torchvision ``efficientnet_b1`` state_dict → :class:`EfficientNetB1`
    params. torchvision layout: ``features.0`` stem, ``features.{1..7}.{i}``
    MBConv blocks whose inner ``block`` Sequential holds
    [expand?][depthwise][SE][project] Conv2dNormActivation units,
    ``features.8`` head (classifier ignored)."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def conv(p, *, dw=False):
        w = sd[f"{p}.weight"]
        if dw:  # torch depthwise (O, 1, kh, kw) → flax HWIO with I=1
            return {"kernel": np.transpose(w, (2, 3, 1, 0))}
        return {"kernel": np.transpose(w, (2, 3, 1, 0))}

    def bn(p):
        return {
            "scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"],
            "mean": sd[f"{p}.running_mean"], "var": sd[f"{p}.running_var"],
        }

    def se(p):
        return (
            {"kernel": np.transpose(sd[f"{p}.fc1.weight"], (2, 3, 1, 0)),
             "bias": sd[f"{p}.fc1.bias"]},
            {"kernel": np.transpose(sd[f"{p}.fc2.weight"], (2, 3, 1, 0)),
             "bias": sd[f"{p}.fc2.bias"]},
        )

    params = {
        "stem_conv": conv("features.0.0"),
        "stem_bn": bn("features.0.1"),
        "head_conv": conv("features.8.0"),
        "head_bn": bn("features.8.1"),
    }
    for si, (t, _c, n, _s, _k) in enumerate(_EFFNET_B1_STAGES, start=1):
        for bi in range(n):
            p = f"features.{si}.{bi}.block"
            entry = {}
            u = 0
            if t != 1:
                entry["expand_conv"] = conv(f"{p}.{u}.0")
                entry["expand_bn"] = bn(f"{p}.{u}.1")
                u += 1
            entry["dw_conv"] = conv(f"{p}.{u}.0", dw=True)
            entry["dw_bn"] = bn(f"{p}.{u}.1")
            u += 1
            fc1, fc2 = se(f"{p}.{u}")
            entry["se_fc1"], entry["se_fc2"] = fc1, fc2
            u += 1
            entry["project_conv"] = conv(f"{p}.{u}.0")
            entry["project_bn"] = bn(f"{p}.{u}.1")
            params[f"stage{si}_{bi}"] = entry
    return params


# ————————————————————————————— extractor factory —————————————————————————————


@dataclass(frozen=True)
class _Spec:
    module: nn.Module
    size: int
    post: str = "flat"  # "alexnet" → dict of nodes


def make_imagenet_extractor(kind: str, params: dict):
    """name → jitted images→features callable for ``reconstruction_metrics``.

    kinds: 'alexnet2', 'alexnet5', 'inception', 'effnet', 'swav' — the
    notebook's rows (cells 14-22) with their per-backbone resize sizes."""
    if kind in ("alexnet2", "alexnet5"):
        model, size = AlexNetFeatures(), 256
        node = "f4" if kind == "alexnet2" else "f11"

        @jax.jit
        def extract(images):
            out = model.apply({"params": params},
                              imagenet_preprocess(images, size))
            return out[node].reshape(images.shape[0], -1)

        return extract

    model, size = {
        "inception": (InceptionV3(), 342),
        "effnet": (EfficientNetB1(), 255),
        "swav": (ResNet50(), 224),
    }[kind]

    @jax.jit
    def extract(images):
        return model.apply({"params": params},
                           imagenet_preprocess(images, size))

    return extract
