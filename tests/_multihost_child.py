"""Child process for tests/test_multihost.py — one member of a 2-process
CPU "pod slice" (4 virtual devices each, 8 global). Runs ONE full
contrastive train step over the global mesh through the multihost feeding
helpers and prints the loss; the parent asserts both members agree and
match the single-process 8-device value. Not a pytest file (leading
underscore keeps collection away)."""

import os
import sys

# 4 local virtual CPU devices per process BEFORE jax backend init
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    .replace("--xla_force_host_platform_device_count=8", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon plugin overrides the env var
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eeg_image_decode_tpu.parallel import multihost  # noqa: E402


def main() -> None:
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    idx, count = multihost.initialize(
        coordinator, num_processes=2, process_id=pid
    )
    assert (idx, count) == (pid, 2), (idx, count)
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
    # idempotent re-entry must be a no-op
    assert multihost.initialize() == (pid, 2)

    from tests.multihost_case import run_case, run_sharded_resident_case

    loss, acc = run_case(multihost_feed=True)
    print(f"RESULT {pid} {loss:.10f} {acc:.10f}", flush=True)

    s_loss, s_acc = run_sharded_resident_case()
    print(f"RESULT-SHARDED {pid} {s_loss:.10f} {s_acc:.10f}", flush=True)


if __name__ == "__main__":
    main()
