#!/usr/bin/env python
"""Two-process jax.distributed exercise of the hybrid DCN mesh branch
(VERDICT r2 #7: `parallel/mesh.py`'s create_hybrid_device_mesh path was
never executed by a real multi-process run).

Launches TWO OS processes (gloo CPU collectives, 4 virtual devices each ->
8 global) whose `jax.process_count() == 2`, so `make_mesh(dp=2, tiles=4)`
takes the multi-host branch: the dp axis spans the two processes (its grad
psum rides the cross-process transport — DCN's stand-in here), while the
tiles axis stays process-local (ICI's stand-in). One hybrid train step runs
on a toy scene and the updated parameters are asserted equal (5e-5) to a
single-device two-camera reference computed locally in each process.

Usage:  python tools/dcn_probe.py            # launcher, writes MULTIPROC_r04.json
        python tools/dcn_probe.py --pid N    # internal worker entry
"""
import argparse
import json
import math
import os
import subprocess
import sys

PORT = 12931
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(pid: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from c3dgs_tpu.config import OptimizationParams
    from c3dgs_tpu.models import gaussians as gmod
    from c3dgs_tpu.ops import losses as L
    from c3dgs_tpu.parallel import make_hybrid_train_step, make_mesh
    from c3dgs_tpu.render.types import RasterSettings
    from c3dgs_tpu.train import trainer

    settings = RasterSettings(
        width=64,
        height=32,
        tanfovx=math.tan(0.5),
        tanfovy=math.tan(0.5),
        sh_degree=0,
    )
    ev = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    evs = jnp.stack([ev, ev + jnp.asarray([0, 0, 0, 0, 0.1, 0, 0])])
    bg = jnp.asarray([0.1, 0.2, 0.3])
    gts = jnp.zeros((2, 3, 32, 64))

    def toy_scene():
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(80, 3)).astype(np.float32) * 0.5
        pts[:, 2] += 3.0
        cols = rng.random(size=(80, 3)).astype(np.float32)
        return gmod.from_point_cloud(pts, cols, capacity=96, quantization=False)

    opt = OptimizationParams()
    mesh = make_mesh(dp=2, tiles=4)  # process_count()==2 -> hybrid branch
    # sanity: the dp axis really spans the two processes
    dev_grid = np.asarray(mesh.devices)
    procs_per_dp_row = [
        len({d.process_index for d in row}) for row in dev_grid
    ]
    assert dev_grid.shape == (2, 4)
    assert all(p == 1 for p in procs_per_dp_row), procs_per_dp_row
    assert (
        {d.process_index for d in dev_grid[0]}
        != {d.process_index for d in dev_grid[1]}
    ), "dp rows must live on different processes"

    state = trainer.create_train_state(toy_scene(), opt, 1.0)

    repl = NamedSharding(mesh, P())

    def to_global(x):
        arr = np.asarray(x)
        return jax.make_array_from_process_local_data(repl, arr, arr.shape)

    state_g = jax.tree_util.tree_map(to_global, state)
    evs_g, gts_g, bg_g = (to_global(v) for v in (evs, gts, bg))

    step = make_hybrid_train_step(mesh, settings, opt, 1.0)
    new_state, metrics = step(state_g, evs_g, gts_g, bg_g)
    loss = float(metrics["loss"])
    dropped = int(metrics["shard_route_dropped"])

    # single-device reference (computed independently in each process)
    state2 = trainer.create_train_state(toy_scene(), opt, 1.0)
    s0 = state2.scene.update_observers()
    params = trainer.scene_params(s0)

    def loss_fn(params):
        s = trainer.with_params(s0, params)
        total = 0.0
        for b in range(2):
            out = trainer.render_scene(s, evs[b], settings, bg)
            total = total + L.photometric_loss(
                out["render"], gts[b], opt.lambda_dssim
            )
        return total / 2

    ref_loss, g_single = jax.value_and_grad(loss_fn)(params)
    tx = trainer.make_optimizer(opt, 1.0)
    updates, _ = tx.update(g_single, state2.opt_state, params)
    expected = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    got = trainer.scene_params(new_state.scene)
    diffs = {
        k: float(np.abs(np.asarray(got[k]) - np.asarray(expected[k])).max())
        for k in expected
    }
    assert all(v < 5e-5 for v in diffs.values()), diffs
    assert abs(loss - float(ref_loss)) < 1e-5, (loss, float(ref_loss))
    assert dropped == 0

    if pid == 0:
        out = {
            "processes": 2,
            "devices_global": 8,
            "mesh": {"dp": 2, "tiles": 4},
            "hybrid_branch": "mesh_utils.create_hybrid_device_mesh",
            "collectives": "gloo (cpu)",
            "loss": loss,
            "ref_loss": float(ref_loss),
            "max_param_update_diff_vs_single_device": max(diffs.values()),
            "per_param_diffs": diffs,
            "shard_route_dropped": dropped,
        }
        with open(os.path.join(REPO, "MULTIPROC_r04.json"), "w") as f:
            json.dump(out, f, indent=1)
        print("[dcn_probe] PASS", json.dumps(out))
    jax.distributed.shutdown()


def launch():
    env = dict(os.environ)
    env.update(
        {
            # keep the tunneled TPU backend out of these workers entirely
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": (
                env.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=4"
            ).strip(),
        }
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--pid", str(i)],
            env=env,
            cwd=REPO,
        )
        for i in range(2)
    ]
    rcs = [p.wait(timeout=900) for p in procs]
    if any(rcs):
        sys.exit(f"worker exit codes {rcs}")
    print("both workers passed; MULTIPROC_r04.json written")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, default=None)
    a = ap.parse_args()
    if a.pid is None:
        launch()
    else:
        worker(a.pid)
