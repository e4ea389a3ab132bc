"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fmhr_tpu.dist import make_render_mesh, make_sharded_ham_step, shard_views
from fmhr_tpu.data.synthetic import hand_scene
from fmhr_tpu.core.mesh import MeshTopology
from fmhr_tpu.raster import AATopology
from fmhr_tpu.optim.ham import HamConfig


def test_mesh_shapes():
    mesh = make_render_mesh(4, 2)
    assert mesh.shape == {"views": 4, "rows": 2}
    mesh1 = make_render_mesh()
    assert mesh1.shape["views"] == len(jax.devices())


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    res, n_views = 32, 8
    verts, faces, w2cs, projs = hand_scene(res=res, n_views=n_views)
    V = verts.shape[0]
    topo = MeshTopology.build(faces, V)
    topo_aa = AATopology.build(faces, V)
    cfg = HamConfig(width=res, height=res, batch=n_views,
                    sfs_weight=50.0, lap_weight=200.0, mask_weight=10.0,
                    edge_weight=5e4, delta_weight=100.0, lr=5e-4,
                    albedo_lr=0.01)
    rng = np.random.default_rng(0)
    imgs = rng.random((n_views, res, res, 3)).astype(np.float32)
    masks = (rng.random((n_views, res, res)) > 0.3).astype(np.float32)
    sh = np.tile(np.array([0.8, 0.1, 0.2, -0.1, 0, 0, 0.05, 0, 0], np.float32),
                 (n_views, 1))
    batch_np = {"imgs": imgs, "masks": masks, "valid_masks": masks,
                "w2cs": w2cs, "projs": projs, "sh": sh}

    losses = {}
    for name, (nv, nr) in (("8dev", (4, 2)), ("1dev", (1, 1))):
        devices = jax.devices()[: nv * nr]
        mesh = make_render_mesh(nv, nr, devices=devices)
        init_fn, step, shardings = make_sharded_ham_step(
            mesh, verts, faces, topo.edges, topo.degrees, topo_aa,
            sh, masks, cfg,
        )
        batch = {k: jax.device_put(jnp.asarray(v), shardings[k])
                 for k, v in batch_np.items()}
        params, opt_state = init_fn()
        params, opt_state, loss = step(params, opt_state, batch)
        losses[name] = float(loss)
        # second step to exercise gradient all-reduce + update
        params, opt_state, loss2 = step(params, opt_state, batch)
        assert np.isfinite(losses[name]) and np.isfinite(float(loss2))

    # sharded and single-device runs compute the same loss (up to
    # cross-device f32 reduction-order drift in the psum)
    np.testing.assert_allclose(losses["8dev"], losses["1dev"], rtol=5e-4)
