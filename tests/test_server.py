"""HTTP serving daemon tests: JSON + binary payloads, chunked batches,
error paths, and concurrent requests through the device lock."""

import io
import json
import urllib.error
import urllib.request

import numpy as np

import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.core.config import ContrastiveTrainConfig, PriorConfig
from eeg_image_decode_tpu.data import make_synthetic_retrieval_data
from eeg_image_decode_tpu.gen.sdxl import Generator4Embeds, GeneratorConfig
from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.serve import ReconstructionService, RetrievalService
from eeg_image_decode_tpu.server import EEGDecodeServer
from eeg_image_decode_tpu.train import ContrastiveTrainer
from eeg_image_decode_tpu.train.prior import PriorPipe


def _post(url, body: bytes, ctype: str):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}, method="POST"
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _trained():
    train, test = make_synthetic_retrieval_data(
        n_classes=12, images_per_class=2, train_reps=2, clip_dim=64,
        n_timepoints=64, snr=2.0,
    )
    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=24, epochs=4, lr=1e-3, eval_ks=(12,),
    )
    model = build_encoder("nice", proj_dim=64, temporal_kernel=9,
                          pool_size=16, pool_stride=4)
    trainer = ContrastiveTrainer(model, cfg, train, test)
    trainer.fit(log_fn=None)
    return model, trainer, test


def test_server_end_to_end():
    model, trainer, test = _trained()
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    retrieval = RetrievalService(model, variables,
                                 test.class_img_features(), max_batch=8)
    prior = PriorPipe(PriorConfig(
        embed_dim=64, cond_dim=64, hidden_dims=(32, 16), time_embed_dim=16,
        num_inference_steps=3, guidance_scale=2.0,
    ))
    prior.init(total_steps=1)
    gen = Generator4Embeds(GeneratorConfig.tiny(), dtype=jnp.float32)
    gen.init(jax.random.key(0))
    recon = ReconstructionService(model, variables, prior, gen, max_batch=4)

    server = EEGDecodeServer(retrieval=retrieval, reconstruction=recon)
    port = server.start()
    base = f"http://127.0.0.1:{port}"
    try:
        # healthz
        with urllib.request.urlopen(f"{base}/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["ok"] and "retrieval" in health["services"]

        # JSON retrieve, oversized batch (chunked server-side)
        body = json.dumps({
            "eeg": np.concatenate([test.eeg] * 2)[:20].tolist(),
            "subject_ids": [1] * 20,
            "k": 3,
        }).encode()
        status, ctype, out = _post(f"{base}/v1/retrieve", body,
                                   "application/json")
        assert status == 200 and "json" in ctype
        resp = json.loads(out)
        assert np.asarray(resp["scores"]).shape == (20, 3)
        # server results == direct service call
        s_direct, i_direct = retrieval.top_k(
            np.concatenate([test.eeg] * 2)[:20], np.full(20, 1), k=3
        )
        np.testing.assert_allclose(resp["scores"], s_direct, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(resp["indices"], i_direct)

        # binary retrieve (.npz body)
        buf = io.BytesIO()
        np.savez(buf, eeg=test.eeg[:4],
                 subject_ids=np.asarray(test.subject_ids[:4], np.int32),
                 k=np.asarray(2))
        status, _, out = _post(f"{base}/v1/retrieve", buf.getvalue(),
                               "application/octet-stream")
        assert status == 200
        assert np.asarray(json.loads(out)["indices"]).shape == (4, 2)

        # scalar subject_ids broadcasts over the wire too (JSON int and
        # 0-d npz array — the direct-API form serve.py documents)
        body = json.dumps({"eeg": test.eeg[:3].tolist(),
                           "subject_ids": 1, "k": 2}).encode()
        status, _, out = _post(f"{base}/v1/retrieve", body,
                               "application/json")
        assert status == 200
        assert np.asarray(json.loads(out)["indices"]).shape == (3, 2)
        buf = io.BytesIO()
        np.savez(buf, eeg=test.eeg[:3], subject_ids=np.asarray(1, np.int32),
                 k=np.asarray(2))
        status, _, out = _post(f"{base}/v1/retrieve", buf.getvalue(),
                               "application/octet-stream")
        assert status == 200
        assert np.asarray(json.loads(out)["indices"]).shape == (3, 2)

        # reconstruct → npz image bytes
        buf = io.BytesIO()
        np.savez(buf, eeg=test.eeg[:2],
                 subject_ids=np.asarray(test.subject_ids[:2], np.int32))
        status, ctype, out = _post(f"{base}/v1/reconstruct", buf.getvalue(),
                                   "application/octet-stream")
        assert status == 200 and "octet-stream" in ctype
        with np.load(io.BytesIO(out)) as z:
            imgs = z["images"]
        assert imgs.shape == (2, 16, 16, 3)
        assert imgs.min() >= 0 and imgs.max() <= 1

        # error paths: missing field → 400; unknown route → 404;
        # unconfigured service → 501
        status = _err_status(f"{base}/v1/retrieve",
                             json.dumps({"eeg": [[[0.0]]]}).encode())
        assert status == 400
        # zero-row request → clean 400, not a np.concatenate 500
        status = _err_status(
            f"{base}/v1/retrieve",
            json.dumps({"eeg": [], "subject_ids": []}).encode(),
        )
        assert status == 400
        # mismatched subject_ids length → 400
        status = _err_status(
            f"{base}/v1/retrieve",
            json.dumps({"eeg": test.eeg[:2].tolist(),
                        "subject_ids": [1]}).encode(),
        )
        assert status == 400
        status = _err_status(f"{base}/v1/nope", b"{}")
        assert status == 404
        server2 = EEGDecodeServer(retrieval=retrieval)  # no reconstruction
        port2 = server2.start()
        try:
            buf.seek(0)
            status = _err_status(
                f"http://127.0.0.1:{port2}/v1/reconstruct", buf.getvalue(),
                "application/octet-stream",
            )
            assert status == 501
        finally:
            server2.stop()

        # concurrency: parallel requests all succeed (device lock serializes)
        import concurrent.futures

        def one(i):
            b = json.dumps({"eeg": test.eeg[i:i + 2].tolist(),
                            "subject_ids": [1, 1], "k": 2}).encode()
            s, _, o = _post(f"{base}/v1/retrieve", b, "application/json")
            return s, json.loads(o)["indices"]

        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            results = list(ex.map(one, range(6)))
        assert all(s == 200 for s, _ in results)
    finally:
        server.stop()


def _err_status(url, body, ctype="application/json"):
    try:
        _post(url, body, ctype)
        return 200
    except urllib.error.HTTPError as e:
        return e.code


def test_coalescer_batches_and_demuxes():
    """The leader–follower coalescer merges a queued backlog into fewer
    device dispatches while every request still gets exactly its own rows;
    incompatible kwargs and oversize requests serve separately; a failing
    batch fans its error out to every member."""
    import threading
    import time

    from eeg_image_decode_tpu.server import _Coalescer

    calls = []
    lock = threading.Lock()

    def fn(rows, k):
        eeg, sids = rows["eeg"], rows["sids"]
        calls.append(eeg.shape[0])
        time.sleep(0.05)  # device-time stand-in: lets a backlog form
        if k == 99:
            raise RuntimeError("boom")
        # row-aligned result: (rows, k) built from the row's own value
        return eeg[:, 0, 0][:, None] * np.ones((1, k)), sids * 2

    co = _Coalescer(fn, lock, max_rows=64)

    def one(i, rows, k, ct=(2, 3)):
        eeg = np.full((rows, *ct), float(i), np.float32)
        sids = np.full((rows,), i, np.int32)
        scores, s2 = co.submit({"eeg": eeg, "sids": sids}, k=k)
        assert scores.shape == (rows, k)
        np.testing.assert_array_equal(scores[:, 0], np.full(rows, float(i)))
        np.testing.assert_array_equal(s2, sids * 2)
        return rows

    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(12) as ex:
        futs = [ex.submit(one, i, 1 + i % 3, 4) for i in range(12)]
        assert sum(f.result() for f in futs) == sum(1 + i % 3
                                                    for i in range(12))
    # coalescing happened: fewer dispatches than requests
    assert len(calls) < 12, calls
    assert sum(calls) == sum(1 + i % 3 for i in range(12))

    # mixed kwargs never merge
    calls.clear()
    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        futs = [ex.submit(one, i, 2, 2 + i % 2) for i in range(4)]
        [f.result() for f in futs]
    assert sum(calls) == 8

    # mixed trailing EEG shapes never merge either: a wrong-shaped request
    # must fail (or succeed) ALONE, not poison a merged np.concatenate
    calls.clear()
    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        futs = [ex.submit(one, i, 2, 4, (2, 3) if i % 2 else (5, 7))
                for i in range(4)]
        [f.result() for f in futs]
    assert sum(calls) == 8

    # oversize request rides alone (max_rows)
    co_small = _Coalescer(fn, lock, max_rows=4)
    out, _ = co_small.submit(
        {"eeg": np.full((9, 2, 3), 7.0, np.float32),
         "sids": np.zeros(9, np.int32)}, k=3)
    assert out.shape == (9, 3)

    # error fanout: every member of a failing batch gets the exception
    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        co.submit({"eeg": np.zeros((2, 2, 3), np.float32),
                   "sids": np.zeros(2, np.int32)}, k=99)


def test_coalesced_reconstruction_matches_serial():
    """Seeded generation must be coalescing-invariant: concurrent
    /v1/reconstruct requests with DIFFERENT seeds merge into one device
    batch yet each returns byte-identical images to the same request served
    alone — per-row noise derives from the request's (seed, row-index), not
    from the merged batch (serve._row_keys)."""
    import concurrent.futures

    model, trainer, test = _trained()
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    prior = PriorPipe(PriorConfig(
        embed_dim=64, cond_dim=64, hidden_dims=(32, 16), time_embed_dim=16,
        num_inference_steps=3, guidance_scale=2.0,
    ))
    prior.init(total_steps=1)
    gen = Generator4Embeds(GeneratorConfig.tiny(), dtype=jnp.float32)
    gen.init(jax.random.key(0))
    recon = ReconstructionService(model, variables, prior, gen, max_batch=8)

    # serial ground truth, one isolated call per request
    seeds = [7, 9, 7, 11]
    sizes = [1, 2, 2, 1]
    serial = [
        recon.reconstruct(test.eeg[i:i + n], test.subject_ids[i:i + n],
                          seed=s)
        for i, (n, s) in enumerate(zip(sizes, seeds))
    ]
    # different seeds must STILL change the output (guards against a bug
    # where row_seeds ignores the seed entirely)
    assert np.abs(serial[0] - recon.reconstruct(
        test.eeg[0:1], test.subject_ids[0:1], seed=9)).max() > 1e-6

    server = EEGDecodeServer(reconstruction=recon)  # coalesce=True default
    port = server.start()
    base = f"http://127.0.0.1:{port}"
    try:
        def one(i):
            n, s = sizes[i], seeds[i]
            buf = io.BytesIO()
            np.savez(buf, eeg=test.eeg[i:i + n],
                     subject_ids=np.asarray(test.subject_ids[i:i + n],
                                            np.int32),
                     seed=np.asarray(s))
            status, _, out = _post(f"{base}/v1/reconstruct", buf.getvalue(),
                                   "application/octet-stream")
            assert status == 200
            with np.load(io.BytesIO(out)) as z:
                return i, z["images"]

        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            results = dict(ex.map(one, range(4)))
        for i, imgs in results.items():
            # BIT-identical, not allclose: the contract is that coalescing
            # never changes a request's result at all (per-row noise + one
            # shared padded-shape program + lossless fp32 npz wire)
            np.testing.assert_array_equal(imgs, serial[i])
    finally:
        server.stop()


def test_coalesced_retrieval_matches_serial():
    """Concurrent mixed-size retrieve requests through the coalescing
    server return byte-identical answers to direct serial service calls
    (retrieval is deterministic, so coalescing must be invisible)."""
    import concurrent.futures

    model, trainer, test = _trained()
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    retrieval = RetrievalService(model, variables,
                                 test.class_img_features(), max_batch=8)
    server = EEGDecodeServer(retrieval=retrieval)  # coalesce=True default
    port = server.start()
    base = f"http://127.0.0.1:{port}"
    sizes = [1, 3, 2, 4, 1, 5, 2, 3]
    try:
        def one(i):
            rows = sizes[i]
            b = json.dumps({"eeg": test.eeg[i:i + rows].tolist(),
                            "subject_ids": [1] * rows, "k": 3}).encode()
            s, _, o = _post(f"{base}/v1/retrieve", b, "application/json")
            assert s == 200
            return i, json.loads(o)

        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            results = dict(ex.map(one, range(8)))
        for i, resp in results.items():
            rows = sizes[i]
            s_direct, i_direct = retrieval.top_k(
                test.eeg[i:i + rows], np.full(rows, 1), k=3)
            np.testing.assert_allclose(resp["scores"], s_direct, rtol=1e-5,
                                       atol=1e-5)
            np.testing.assert_array_equal(resp["indices"], i_direct)
    finally:
        server.stop()
