"""Worker for the 2-process jax.distributed smoke test (run by
tests/test_multihost.py, one subprocess per rank).

Exercises the REAL multi-process path the reference reaches through its
deepspeed launcher (script/training.sh:34-37): coordinator handshake via
`maybe_initialize_multihost`, a cross-process psum, and one data-parallel
gradient step of the actual model on a process-spanning mesh.
"""

import sys
from types import SimpleNamespace

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from unimoe_audio_tpu.parallel.multihost import maybe_initialize_multihost  # noqa: E402


def main() -> int:
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    args = SimpleNamespace(multihost=True, coordinator_address=coord,
                           num_processes=nproc, process_id=pid)
    assert maybe_initialize_multihost(args)
    assert jax.process_count() == nproc, jax.process_count()
    local = jax.local_device_count()
    devs = jax.devices()
    assert len(devs) == nproc * local

    mesh = Mesh(np.asarray(devs), ("data",))
    sh = NamedSharding(mesh, P("data"))

    # --- cross-process psum: every process contributes pid+1 per row ----
    rows_per_proc = len(devs) // nproc * 2
    mine = np.full((rows_per_proc, 4), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(sh, mine)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    expect = sum((p + 1) * rows_per_proc * 4 for p in range(nproc))
    got = float(total)
    assert got == expect, (got, expect)
    print(f"rank {pid}: psum ok ({got})", flush=True)

    # --- one data-parallel train step of the real model ------------------
    from unimoe_audio_tpu.config import tiny_test_config
    from unimoe_audio_tpu.models.model import init_model_params, model_forward

    cfg = tiny_test_config(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.asarray(x)), params)

    B_local = len(devs) // nproc  # one row per local device
    S = 16
    rng = np.random.default_rng(1234 + pid)  # DISTINCT data per process
    ids = rng.integers(5, 100, (B_local, S)).astype(np.int32)
    labels = ids.copy()
    labels[:, :4] = -100
    batch = {
        "input_ids": ids,
        "attention_mask": np.ones((B_local, S), np.int32),
        "labels": labels,
    }
    batch = {k: jax.make_array_from_process_local_data(sh, v)
             for k, v in batch.items()}

    def loss_fn(p, b):
        out = model_forward(p, cfg, b["input_ids"],
                            attention_mask=b["attention_mask"],
                            labels=b["labels"], aux_loss_weight=0.025)
        return out.loss

    step = jax.jit(jax.value_and_grad(loss_fn),
                   out_shardings=(NamedSharding(mesh, P()),
                                  NamedSharding(mesh, P())))
    loss, grads = step(params, batch)
    loss = float(loss)
    gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                               for g in jax.tree.leaves(grads))))
    assert np.isfinite(loss) and np.isfinite(gnorm) and gnorm > 0
    print(f"rank {pid}: step ok loss={loss:.4f} gnorm={gnorm:.4f}", flush=True)
    # Both ranks must agree bit-for-bit on the replicated global loss.
    print(f"RESULT {loss!r} {gnorm!r}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
