"""Serving: low-latency retrieval and reconstruction services.

The reference is research scripts only; this wraps the trained artifacts for
production use on TPU:

- ``RetrievalService``: EEG epochs in → top-k image/class ids out. The gallery
  (CLIP features of the candidate images) lives in HBM; encode + similarity +
  top-k is one jit. Batched and single-query paths share the compiled fn via
  padding to a fixed batch.
- ``ReconstructionService``: EEG epochs → images, chaining encoder → diffusion
  prior (CFG lax.scan) → SDXL generator; every stage jit-cached so steady-state
  latency is pure device time (~0.12 s/image at full SDXL size on one v5e,
  ``scripts/bench_all.py::reconstruction_latency_e2e``).
- ``CaptionService``: EEG epochs → caption strings, chaining encoder → prior →
  PixelProjector → greedy GIT decode → WordPiece detokenize (the semantic-level
  pipeline of ``GIT_caption_batch.ipynb`` as a service).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _check_request(eeg: np.ndarray, subject_ids) -> tuple[np.ndarray, np.ndarray]:
    """Shared request validation: a zero-row request would otherwise crash in
    ``np.concatenate`` after the (empty) chunk loop — fail fast with a clear
    message instead (the HTTP daemon maps ValueError → 400)."""
    eeg = np.asarray(eeg, np.float32)
    if eeg.ndim != 3:
        raise ValueError(f"eeg must be (B, C, T); got shape {eeg.shape}")
    if eeg.shape[0] == 0:
        raise ValueError("request contains zero EEG rows")
    subject_ids = np.asarray(subject_ids, np.int32)
    if subject_ids.ndim == 0:  # scalar OR 0-d array (JSON/npz wire forms)
        subject_ids = np.full(eeg.shape[0], subject_ids, np.int32)
    if subject_ids.shape != (eeg.shape[0],):
        raise ValueError(
            f"subject_ids shape {subject_ids.shape} does not match "
            f"batch size {eeg.shape[0]}"
        )
    return eeg, subject_ids


def _default_row_seeds(n: int, seed: int) -> np.ndarray:
    """(seed, row-index-within-request) pairs — the per-row PRNG identity.
    Deriving noise from THESE (rather than from a batch-level key) makes a
    row's output independent of the batch it rides in, so the HTTP
    coalescer (``server.py::_Coalescer``) can merge concurrent seeded
    requests without changing anyone's result."""
    return np.stack(
        [np.full(n, seed, np.uint32), np.arange(n, dtype=np.uint32)], axis=1
    )


def _check_row_seeds(row_seeds, n: int, seed: int) -> np.ndarray:
    """Default/validate per-row seeds against the request's row count —
    a miscounted caller array must fail HERE with a clear ValueError, not
    as a shape mismatch deep inside the fused jit trace."""
    if row_seeds is None:
        return _default_row_seeds(n, seed)
    row_seeds = np.asarray(row_seeds, np.uint32)
    if row_seeds.shape != (n, 2):
        raise ValueError(
            f"row_seeds must have shape ({n}, 2) — one (seed, row-index) "
            f"pair per EEG row; got {row_seeds.shape}"
        )
    return row_seeds


def _row_keys(row_seeds: jax.Array, domain: int) -> jax.Array:
    """(B, 2) uint32 (seed, row) pairs → (B,) typed PRNG keys, namespaced by
    ``domain`` (0 = prior sampling, 1 = SDXL generation)."""
    root = jax.random.key(0)

    def one(pair):
        k = jax.random.fold_in(root, pair[0])
        k = jax.random.fold_in(k, pair[1])
        return jax.random.fold_in(k, domain)

    return jax.vmap(one)(row_seeds)


class RetrievalService:
    def __init__(
        self,
        model,
        variables: dict,
        gallery_features: np.ndarray,
        *,
        max_batch: int = 256,
        transfer_dtype=None,
        k_cap: int = 64,
    ):
        self.model = model
        self.variables = variables
        self.gallery = jax.device_put(
            jnp.asarray(gallery_features, jnp.float32)
        )
        self.max_batch = max_batch
        # one compiled program serves EVERY k ≤ k_cap: the device computes
        # top-k_cap and the host slices to the requested k; the rare
        # k > k_cap rides a second, full-top-gallery program — so at most
        # TWO programs per bucket ever exist and an arbitrary client k never
        # pays an XLA compile on the live path (a cold (bucket, k) program
        # measured as a 14.5 s p99 outlier).
        self.k_cap = max(1, min(k_cap, int(gallery_features.shape[0])))
        # host→device wire format for the EEG rows. The coalesced-batch
        # dispatch is TRANSFER-bound, not compute-bound (measured on this
        # host: 375 ms for a 256-row call of which 342 ms is the 16 MB fp32
        # copy; compute+readback is 46 ms — docs/PERF.md). float16 halves
        # the bytes; a bfloat16 serving model casts its input down anyway,
        # so the decision deltas are at bf16 resolution already.
        self.transfer_dtype = np.dtype(transfer_dtype) if transfer_dtype \
            else None
        # bucketed compile shapes: a chunk pads to the SMALLEST bucket that
        # fits, so a single small request keeps its small-dispatch latency
        # while a coalesced burst (server.py::_Coalescer) rides one big
        # dispatch — at most len(buckets) compiled programs per k
        self.buckets = tuple(sorted({
            b for b in (8, 32, max_batch) if b <= max_batch
        }))

        from functools import partial

        @partial(jax.jit, static_argnames=("k",))
        def query(variables, gallery, eeg, subject_ids, k):
            feats, scale = model.apply(
                variables, eeg, subject_ids, deterministic=True
            )
            logits = scale * jnp.dot(
                feats.astype(jnp.float32), gallery.T,
                preferred_element_type=jnp.float32,
            )
            scores, idx = jax.lax.top_k(logits, k)
            return scores, idx

        self._query = query

    def warmup(self, eeg_shape: tuple[int, int],
               ks: tuple[int, ...] = ()) -> None:
        """Compile every bucket shape up front (one dummy dispatch per
        bucket over ``eeg_shape=(C, T)``) so no live request ever pays a
        compile on the serving path — a cold bucket hit by the first
        coalesced burst measured as a 14.5 s p99 outlier (docs/PERF.md).
        The device program computes top-``k_cap`` regardless of the client
        k, so one compile per bucket covers every k ≤ k_cap; pass a ``ks``
        value above k_cap to also pre-warm the full-ranking program that
        serves every such k."""
        c, t = eeg_shape
        for b in self.buckets:
            for k in {1, *ks}:  # k=1 rides the shared top-k_cap program
                self.top_k(np.zeros((b, c, t), np.float32),
                           np.zeros(b, np.int32), k=k)

    def top_k(
        self,
        eeg: np.ndarray,
        subject_ids: np.ndarray | int,
        k: int = 5,
    ) -> tuple[np.ndarray, np.ndarray]:
        """(B, C, T) EEG → (scores (B, k), gallery indices (B, k)).

        Requests are chunked by ``max_batch`` (last chunk padded up), so
        every call hits the one compiled program regardless of request
        size — same contract as :class:`ReconstructionService`."""
        eeg, subject_ids = _check_request(eeg, subject_ids)
        n_gallery = int(self.gallery.shape[0])
        if not 1 <= k <= n_gallery:
            raise ValueError(
                f"k must be in [1, {n_gallery}] (gallery size); got {k}"
            )
        # the device computes top-k_cap (or the full top-gallery ranking for
        # the rare k > k_cap) and the host slices to k — at most TWO compiled
        # programs per bucket ever exist, so no client-chosen k can force a
        # fresh XLA compile on the live path behind the device lock
        kq = self.k_cap if k <= self.k_cap else n_gallery
        n = eeg.shape[0]
        all_scores, all_idx = [], []
        for start in range(0, n, self.max_batch):
            chunk = eeg[start : start + self.max_batch]
            sids = subject_ids[start : start + self.max_batch]
            m = chunk.shape[0]
            bucket = next(b for b in self.buckets if b >= m)
            pad = bucket - m
            eeg_p = np.pad(chunk, ((0, pad), (0, 0), (0, 0)))
            if self.transfer_dtype is not None:
                eeg_p = eeg_p.astype(self.transfer_dtype)
            sid_p = np.pad(sids, (0, pad))
            scores, idx = self._query(
                self.variables, self.gallery, jnp.asarray(eeg_p),
                jnp.asarray(sid_p), k=kq,
            )
            # keep device futures; materialize after the loop so chunk i's
            # readback overlaps chunk i+1's compute (dispatch is async)
            all_scores.append((scores, m))
            all_idx.append((idx, m))
        return (
            np.concatenate([np.asarray(s)[:m, :k] for s, m in all_scores]),
            np.concatenate([np.asarray(i)[:m, :k] for i, m in all_idx]),
        )


class ReconstructionService:
    def __init__(self, model, variables, prior_pipe, generator, *,
                 max_batch: int = 16, fused: bool = True):
        """``fused=True`` (default) runs encoder → prior CFG scan → SDXL
        UNet steps → VAE decode as ONE jitted program per chunk instead of
        three: one host→device round trip per chunk instead of three, and
        XLA schedules across the stage boundaries. The staged path is kept
        (``fused=False``) and produces identical images (tested)."""
        self.model = model
        self.variables = variables
        self.prior = prior_pipe
        self.generator = generator
        self.max_batch = max_batch
        self.fused = fused

        @jax.jit
        def encode(variables, eeg, subject_ids):
            feats, _ = model.apply(
                variables, eeg, subject_ids, deterministic=True
            )
            return feats.astype(jnp.float32)

        self._encode = encode
        self._fused_fn = None  # built lazily: prior state may load later

    def _build_fused(self):
        from eeg_image_decode_tpu.gen.sdxl import _generate_jit
        from eeg_image_decode_tpu.ops.ddpm import make_cfg_sampler

        pcfg = self.prior.cfg
        gcfg = self.generator.config
        model = self.model
        prior_model = self.prior.model
        schedule = self.prior.schedule

        def fused(variables, prior_params, gen_params, text, eeg,
                  subject_ids, row_seeds):
            feats, _ = model.apply(
                variables, eeg, subject_ids, deterministic=True
            )
            feats = feats.astype(jnp.float32)
            sampler = make_cfg_sampler(
                lambda x, t, cond, mask: prior_model.apply(
                    {"params": prior_params}, x, t, cond, mask,
                    deterministic=True,
                ),
                schedule,
                num_inference_steps=pcfg.num_inference_steps,
                guidance_scale=pcfg.guidance_scale,
            )
            # per-ROW keys: each row's noise is a function of its request's
            # (seed, row-index) only — coalescing-safe (see _row_keys)
            embeds = sampler(
                jax.random.key(0), feats, (feats.shape[0], pcfg.embed_dim),
                row_keys=_row_keys(row_seeds, 0),
            )
            ctx, pooled = text
            return _generate_jit(
                self.generator, gcfg.num_inference_steps,
                float(gcfg.guidance_scale), None, True,
                gen_params, embeds, ctx, pooled, None, jax.random.key(0),
                _row_keys(row_seeds, 1),
            )

        self._fused_fn = jax.jit(fused)

    def _default_text(self, b: int):
        gcfg = self.generator.config
        dt = getattr(self.generator, "_default_text", None)
        if dt is not None:
            ctx0, pooled0 = dt
            ctx = jnp.broadcast_to(ctx0, (b, *ctx0.shape[1:]))
            pooled = (
                None if pooled0 is None
                else jnp.broadcast_to(pooled0, (b, pooled0.shape[-1]))
            )
            return ctx, pooled
        return (
            jnp.zeros((b, gcfg.text_len, gcfg.unet.cross_attention_dim)),
            None,
        )

    def warmup(self, eeg_shape: tuple[int, int]) -> None:
        """Compile the (single) chunk shape before accepting traffic: the
        first full-size fused SDXL compile takes minutes on a cold cache —
        far beyond any client timeout if paid on the live path."""
        c, t = eeg_shape
        self.reconstruct(np.zeros((1, c, t), np.float32),
                         np.zeros(1, np.int32))

    def reconstruct(
        self,
        eeg: np.ndarray,
        subject_ids: np.ndarray | int,
        *,
        seed: int = 0,
        row_seeds: np.ndarray | None = None,
    ) -> np.ndarray:
        """(B, C, T) EEG → (B, H, W, 3) images in [0, 1].

        Requests are chunked into ``max_batch``-sized pieces (the last one
        padded up), so every encoder/prior/UNet call runs at exactly one
        compiled shape — an oversized request costs extra chunks, never a
        fresh jit trace of the SDXL graph.

        Noise is drawn per ROW from ``row_seeds`` ((B, 2) uint32
        (seed, row-index) pairs; default ``(seed, 0..B-1)``), so the same
        request+seed reproduces the same images whether it runs alone, in a
        coalesced batch, or split across chunks."""
        eeg, subject_ids = _check_request(eeg, subject_ids)
        n = eeg.shape[0]
        row_seeds = _check_row_seeds(row_seeds, n, seed)
        out = []
        for start in range(0, n, self.max_batch):
            chunk = eeg[start : start + self.max_batch]
            sids = subject_ids[start : start + self.max_batch]
            m = chunk.shape[0]
            pad = self.max_batch - m
            eeg_p = np.pad(chunk, ((0, pad), (0, 0), (0, 0)))
            sid_p = np.pad(sids, (0, pad))
            rs_p = np.pad(row_seeds[start : start + self.max_batch],
                          ((0, pad), (0, 0)))
            if self.fused:
                if self._fused_fn is None:
                    self._build_fused()
                imgs = self._fused_fn(
                    self.variables, self.prior.state.params,
                    self.generator.params,
                    self._default_text(self.max_batch),
                    jnp.asarray(eeg_p), jnp.asarray(sid_p),
                    jnp.asarray(rs_p),
                )
            else:
                feats = self._encode(
                    self.variables, jnp.asarray(eeg_p), jnp.asarray(sid_p)
                )
                rk = jnp.asarray(rs_p)
                embeds = self.prior.generate(
                    feats, row_keys=_row_keys(rk, 0))
                imgs = self.generator.generate(
                    embeds, row_keys=_row_keys(rk, 1))
            # device future, not np.asarray: materializing after the loop
            # lets chunk i's ~12 MB image readback overlap chunk i+1's
            # compute (dispatch is async)
            out.append((imgs, m))
        return np.concatenate([np.asarray(im)[:m] for im, m in out], axis=0)


class CaptionService:
    """EEG → caption strings (the reference's semantic-level pipeline)."""

    def __init__(self, model, variables, prior_pipe, captioner,
                 captioner_params: dict, projector_params: dict, tokenizer,
                 *, max_batch: int = 32, max_new_tokens: int = 25):
        from eeg_image_decode_tpu.models.git_caption import PixelProjector

        self.model = model
        self.variables = variables
        self.prior = prior_pipe
        self.captioner = captioner
        self.captioner_params = captioner_params
        self.tokenizer = tokenizer
        self.max_batch = max_batch
        self.max_new_tokens = max_new_tokens
        cfg = captioner.config
        self._projector = PixelProjector(
            num_tokens=cfg.num_visual_tokens, out_dim=cfg.visual_dim
        )
        self._projector_params = projector_params

        @jax.jit
        def encode(variables, eeg, subject_ids):
            feats, _ = model.apply(
                variables, eeg, subject_ids, deterministic=True
            )
            return feats.astype(jnp.float32)

        self._encode = encode

    def warmup(self, eeg_shape: tuple[int, int]) -> None:
        """Compile the (single) chunk shape before accepting traffic (see
        :meth:`ReconstructionService.warmup`)."""
        c, t = eeg_shape
        self.caption(np.zeros((1, c, t), np.float32), np.zeros(1, np.int32))

    def caption(
        self,
        eeg: np.ndarray,
        subject_ids: np.ndarray | int,
        *,
        seed: int = 0,
        row_seeds: np.ndarray | None = None,
    ) -> list[str]:
        """(B, C, T) EEG → B caption strings. Requests chunk by ``max_batch``
        (last chunk padded up) so every call hits one compiled program.

        Prior noise is per-ROW keyed (see
        :meth:`ReconstructionService.reconstruct`): same request+seed → same
        captions regardless of coalescing/chunking. The GIT decode itself is
        greedy (deterministic)."""
        eeg, subject_ids = _check_request(eeg, subject_ids)
        n = eeg.shape[0]
        row_seeds = _check_row_seeds(row_seeds, n, seed)
        out: list[str] = []
        for start in range(0, n, self.max_batch):
            chunk = eeg[start : start + self.max_batch]
            sids = subject_ids[start : start + self.max_batch]
            m = chunk.shape[0]
            pad = self.max_batch - m
            eeg_p = np.pad(chunk, ((0, pad), (0, 0), (0, 0)))
            sid_p = np.pad(sids, (0, pad))
            rs_p = np.pad(row_seeds[start : start + self.max_batch],
                          ((0, pad), (0, 0)))
            feats = self._encode(
                self.variables, jnp.asarray(eeg_p), jnp.asarray(sid_p)
            )
            embeds = self.prior.generate(
                feats, row_keys=_row_keys(jnp.asarray(rs_p), 0)
            )
            grids = self._projector.apply(
                {"params": self._projector_params}, embeds
            )
            tokens = np.asarray(self.captioner.generate(
                {"params": self.captioner_params}, grids,
                max_new_tokens=self.max_new_tokens,
            ))[:m]
            out.extend(self.tokenizer.decode(row) for row in tokens)
        return out
