"""Coverage for small utilities: StepTimer, euler edge cases, MEG save,
THINGS metadata CSV loader, mesh helpers."""

import numpy as np
import jax.numpy as jnp

from eeg_image_decode_tpu.core.mesh import local_batch_size, create_mesh
from eeg_image_decode_tpu.ops.euler import EulerDiscreteSchedule
from eeg_image_decode_tpu.preprocess.images_set import load_things_metadata
from eeg_image_decode_tpu.preprocess.meg import save_meg
from eeg_image_decode_tpu.utils.profiling import StepTimer


def test_step_timer():
    import time

    t = StepTimer()
    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop()
    assert 0.005 < t.best < 0.2
    assert t.mean >= t.best


def test_euler_nonancestral_no_noise_dependence(rng):
    s = EulerDiscreteSchedule(ancestral=False)
    x = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    n1 = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    a = s.step(eps, jnp.asarray(3.0), jnp.asarray(1.0), x, n1)
    b = s.step(eps, jnp.asarray(3.0), jnp.asarray(1.0), x, jnp.zeros_like(n1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_euler_final_step_is_noiseless(rng):
    s = EulerDiscreteSchedule(ancestral=True)
    x = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    big_noise = jnp.full_like(x, 100.0)
    out = s.step(eps, jnp.asarray(2.0), jnp.asarray(0.0), x, big_noise)
    # σ_next = 0 → pure denoise to x0, noise must not leak in
    np.testing.assert_allclose(np.asarray(out), np.asarray(x - 2.0 * eps),
                               rtol=1e-5)


def test_save_meg_roundtrip(tmp_path, rng):
    import pickle

    tr = rng.normal(size=(3, 2, 1, 4, 10)).astype(np.float32)
    te = rng.normal(size=(2, 1, 2, 4, 10)).astype(np.float32)
    save_meg(str(tmp_path), tr, te, ["a", "b", "c", "d"], np.linspace(0, 1, 10))
    with open(tmp_path / "preprocessed_meg_train.npy", "rb") as f:
        d = pickle.load(f)
    np.testing.assert_array_equal(d["meg_data"], tr)
    assert d["ch_names"] == ["a", "b", "c", "d"]


def test_load_things_metadata(tmp_path):
    (tmp_path / "paths.csv").write_text(
        "images/aardvark/a1.jpg\nimages/zebra/z1.jpg\n"
    )
    (tmp_path / "concepts.csv").write_text("1\n2\n")
    paths, concepts = load_things_metadata(
        str(tmp_path / "paths.csv"), str(tmp_path / "concepts.csv")
    )
    assert paths == ["images/aardvark/a1.jpg", "images/zebra/z1.jpg"]
    assert concepts == [1, 2]


def test_local_batch_size():
    mesh = create_mesh(data_parallel=8)
    assert local_batch_size(64, mesh) == 8
