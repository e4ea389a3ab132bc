"""GCN decoder: hierarchy construction, forward shapes, short training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fmhr_tpu.body import synthetic_hand_model
from fmhr_tpu.nn.gcn import build_gcn_decoder
from fmhr_tpu.nn.mesh_sampling import generate_transform_matrices, qslim_decimate
from fmhr_tpu.optim.gcn_train import make_gcn_train_step, gcn_infer, mpvpe_mpjpe


def test_qslim_halves_vertices():
    m = synthetic_hand_model()
    nf, keep, roots = qslim_decimate(m.v_template, m.faces, m.v_template.shape[0] // 2)
    assert keep.shape[0] <= m.v_template.shape[0] // 2 + 2
    assert nf.max() < keep.shape[0]
    assert nf.shape[0] > 0


def test_hierarchy_shapes():
    m = synthetic_hand_model()
    H = generate_transform_matrices(m.v_template, m.faces)
    assert len(H["A"]) == 5 and len(H["U"]) == 4
    V0 = m.v_template.shape[0]
    assert H["verts"][1].shape[0] == V0          # factor 1 level
    assert H["verts"][2].shape[0] <= V0 // 2 + 2
    # U maps coarse -> fine with rows summing to 1 (barycentric)
    for U in H["U"][1:]:
        np.testing.assert_allclose(U.sum(1), 1.0, atol=1e-5)


def test_gcn_forward_and_training():
    m = synthetic_hand_model()
    model, H = build_gcn_decoder(m.v_template, m.faces)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 63)))
    x_hat, mano_params, tmp = model.apply(params, jnp.zeros((2, 63)))
    assert x_hat.shape == (2, m.v_template.shape[0], 3)
    assert mano_params.shape == (2, 55)
    assert len(tmp) == 4

    init_opt, step = make_gcn_train_step(model.apply, m, m.faces, lr=1e-3)
    opt_state = init_opt(params)
    rng = np.random.default_rng(0)
    # fixed batch + fixed augmentation rng -> descent must be monotone-ish
    pose = jnp.asarray(rng.normal(size=(4, 48)) * 0.2, jnp.float32)
    shape = jnp.asarray(rng.normal(size=(4, 10)) * 0.3, jnp.float32)
    trans = jnp.asarray(rng.normal(size=(4, 3)) * 0.1, jnp.float32)
    sub = jax.random.PRNGKey(1)
    losses = []
    for i in range(10):
        params, opt_state, loss = step(params, opt_state, pose, shape, trans, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_gcn_infer_alignment():
    m = synthetic_hand_model()
    model, H = build_gcn_decoder(m.v_template, m.faces)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 63)))
    joints = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 21, 3)).astype(np.float32)
    )
    verts, mano_aligned, mano, Rt, mid = gcn_infer(
        model.apply, params, m, joints, refine_steps=10
    )
    assert verts.shape == (1, m.v_template.shape[0], 3)
    assert mano_aligned.shape == verts.shape
    assert Rt.shape == (1, 4, 4)
    assert np.isfinite(np.asarray(mano_aligned)).all()
    e1, e2 = mpvpe_mpjpe(verts, verts, joints, joints)
    assert float(e1) == 0 and float(e2) == 0
