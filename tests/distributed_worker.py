"""Subprocess worker for the real two-process jax.distributed test.

Run as: python distributed_worker.py <coordinator> <num_procs> <pid>
Each process gets 2 virtual CPU devices; the global mesh therefore has
2×num_procs devices, and the jitted global sum exercises a genuine
cross-process collective (Gloo over loopback — the same jax.distributed
code path a multi-host TPU pod takes over DCN).
"""

import os
import sys


def main() -> None:
    coordinator, n, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from softspoken_tpu.parallel.distributed import init_distributed, partition_files

    init_distributed(coordinator, n, pid)
    assert jax.process_count() == n, jax.process_count()
    assert jax.device_count() == 2 * n, jax.device_count()

    # disjoint deterministic work split
    mine = partition_files([f"f{i:02d}.wav" for i in range(7)])

    # cross-process collective: every process contributes (pid+1) twice
    mesh = Mesh(np.array(jax.devices()).reshape(2 * n), ("data",))
    local = np.full((2,), float(pid + 1), np.float32)
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (2 * n,)
    )
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(x)
    expect = float(sum(2 * (p + 1) for p in range(n)))
    assert float(total) == expect, (float(total), expect)

    print(f"OK pid={pid} files={','.join(mine)} sum={float(total)}", flush=True)


if __name__ == "__main__":
    main()
