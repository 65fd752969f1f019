"""Worker process for the 2-process multi-host CI test.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
       <devices_per_process> <out_npz>

Each process initializes jax.distributed on the CPU backend with N virtual
devices, builds the global mesh, solves the shared deterministic BA problem
point-sharded across BOTH processes (gloo psums on the reduced camera
system), and process 0 writes the result for the parent test to compare
against the single-process solve.
"""

import sys


def main():
    proc_id, nproc, port, ndev = (int(a) for a in sys.argv[1:5])
    out = sys.argv[5]

    from sdvl_tpu.dist import multihost

    multihost.initialize(f"localhost:{port}", nproc, proc_id,
                         local_device_count=ndev, platform="cpu")

    import jax
    import numpy as np

    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * ndev, len(jax.devices())

    from sdvl_tpu.dist import ba_sharded
    from sdvl_tpu.solvers.ba import BAProblem

    problem = multihost.demo_ba_problem()
    mesh = multihost.global_mesh()
    problem = BAProblem(
        poses=multihost.put_replicated(problem.poses, mesh),
        fixed=multihost.put_replicated(problem.fixed, mesh),
        points=multihost.put_sharded(problem.points, mesh, "point"),
        obs_uv=multihost.put_sharded(problem.obs_uv, mesh, "point"),
        obs_mask=multihost.put_sharded(problem.obs_mask, mesh, "point"),
    )
    huber = float(np.sqrt(5.991) / 420.0)
    res = ba_sharded.solve_sharded(problem, mesh, huber=huber)

    # poses/chi2 are replicated -> fully addressable on every process
    poses = np.asarray(res.poses)
    chi2 = float(res.chi2)
    # points are sharded: gather this process's shards
    local_pts = {
        str(s.index[0].start): np.asarray(s.data)
        for s in res.points.addressable_shards
    }
    if proc_id == 0:
        np.savez(out, poses=poses, chi2=chi2)
    np.savez(out + f".pts{proc_id}.npz", **local_pts)
    print(f"proc {proc_id} ok chi2={chi2:.6e}", flush=True)


if __name__ == "__main__":
    main()
