"""Direct-execution parity: run the REFERENCE's own torch code and
compare against our JAX implementations on identical random inputs.

Every other oracle here is either self-referential or hand-derived
(test_golden.py). These tests execute `/root/reference/models/utils.py`
itself (torch CPU; unimportable heavy deps stubbed — none of the
functions under test touch them), so a convention drift against the
actual reference implementation fails loudly. Skipped when the
reference checkout or torch is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

REF_UTILS = "/root/reference/models/utils.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_UTILS), reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref():
    """Execute the reference's models/utils.py with missing heavy deps
    stubbed (skimage/trimesh/plyfile are imported at module level but
    unused by the pure-tensor functions under test)."""
    stubs = {}
    for name in ("skimage", "skimage.measure", "plyfile", "trimesh"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "skimage":
                mod.measure = types.ModuleType("skimage.measure")
            stubs[name] = mod
    sys.modules.update(stubs)
    try:
        ns = {"__name__": "_ref_utils", "__file__": REF_UTILS}
        with open(REF_UTILS) as f:
            code = f.read()
        exec(compile(code, REF_UTILS, "exec"), ns)
        yield ns
    finally:
        for name in stubs:
            sys.modules.pop(name, None)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def t(a):
    return torch.from_numpy(np.asarray(a))


def test_batch_rodrigues_matches_reference(ref, rng):
    from fmhr_tpu.core.rotations import rodrigues

    theta = rng.standard_normal((32, 3)).astype(np.float32) * 2.0
    theta[0] = 0.0  # the zero-angle branch too
    want = ref["batch_rodrigues"](t(theta)).numpy()
    got = np.asarray(rodrigues(jnp.asarray(theta)))
    np.testing.assert_allclose(got, want.reshape(-1, 3, 3), atol=2e-6)


def test_quat2mat_matches_reference(ref, rng):
    from fmhr_tpu.core.rotations import quat_to_matrix

    q = rng.standard_normal((16, 4)).astype(np.float32)
    want = ref["quat2mat"](t(q)).numpy()
    got = np.asarray(quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_rigid_chain_matches_reference(ref, rng):
    from fmhr_tpu.core.rotations import rigid_transform_chain, rodrigues

    B, J = 3, 16
    parents_np = np.array(
        [0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14])
    theta = rng.standard_normal((B, J, 3)).astype(np.float32) * 0.5
    Js = rng.standard_normal((B, J, 3)).astype(np.float32)
    Rs = np.stack(
        [ref["batch_rodrigues"](t(theta[b])).numpy().reshape(J, 3, 3)
         for b in range(B)])
    want_J, want_A = ref["batch_global_rigid_transformation"](
        t(Rs), t(Js), parents_np, rotate_base=False)
    got_J, got_A = rigid_transform_chain(
        jnp.asarray(rodrigues(jnp.asarray(theta.reshape(-1, 3)))
                    .reshape(B, J, 3, 3)), jnp.asarray(Js), parents_np)
    np.testing.assert_allclose(np.asarray(got_J), want_J.numpy(), atol=3e-6)
    np.testing.assert_allclose(np.asarray(got_A), want_A.numpy(), atol=3e-6)


def test_sh_matrix_and_radiance_match_reference(ref, rng):
    from fmhr_tpu.core.sh import sh_basis, sh_radiance

    # the reference API is FLAT [N, 3] normals; coeff "9 or n 9"
    n = rng.standard_normal((44, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    coeff = rng.standard_normal((44, 9)).astype(np.float32)
    for degree in (1, 2, 3):
        want_m = ref["get_matrix"](t(n), degree=degree).numpy()
        got_m = np.asarray(sh_basis(jnp.asarray(n), degree=degree))
        np.testing.assert_allclose(got_m, want_m, atol=2e-6)
        want_r = ref["get_radiance"](
            t(coeff[:, :degree ** 2]), t(n), degree=degree).numpy()
        got_r = np.asarray(sh_radiance(
            jnp.asarray(coeff[:, :degree ** 2]), jnp.asarray(n),
            degree=degree))
        np.testing.assert_allclose(got_r, want_r, atol=2e-5)


def test_eval_sh_matches_reference(ref, rng):
    from fmhr_tpu.core.sh import eval_sh

    dirs = rng.standard_normal((64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    for deg in range(5):
        sh = rng.standard_normal((64, 3, (deg + 1) ** 2)).astype(np.float32)
        want = ref["eval_sh"](deg, t(sh), t(dirs)).numpy()
        got = np.asarray(eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs)))
        np.testing.assert_allclose(got, want, atol=3e-6)


def _ico_mesh():
    ph = (1 + 5 ** 0.5) / 2
    v = np.array(
        [[-1, ph, 0], [1, ph, 0], [-1, -ph, 0], [1, -ph, 0],
         [0, -1, ph], [0, 1, ph], [0, -1, -ph], [0, 1, -ph],
         [ph, 0, -1], [ph, 0, 1], [-ph, 0, -1], [-ph, 0, 1]], np.float32)
    f = np.array(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
        np.int32)
    return v, f


def test_get_normals_matches_reference(ref, rng):
    from fmhr_tpu.core.mesh import vertex_normals

    v, f = _ico_mesh()
    verts = (v[None] + 0.05 * rng.standard_normal((3, 12, 3))
             ).astype(np.float32)
    want = ref["get_normals"](t(verts), t(f).long()).numpy()
    got = np.asarray(vertex_normals(jnp.asarray(verts), f))
    np.testing.assert_allclose(got, want, atol=3e-6)


def test_laplacian_smoothing_matches_reference(ref, rng):
    from fmhr_tpu.core.mesh import MeshTopology, laplacian_smoothing

    v, f = _ico_mesh()
    verts = (v + 0.05 * rng.standard_normal((12, 3))).astype(np.float32)
    want = float(ref["laplacian_smoothing"](
        t(verts), t(f).long(), method="uniform"))
    topo = MeshTopology.build(f, 12)
    got = float(laplacian_smoothing(
        jnp.asarray(verts), jnp.asarray(topo.edges),
        jnp.asarray(topo.degrees)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("method", ["cot", "cotcurv"])
def test_laplacian_cot_matches_reference(ref, rng, method):
    """Direct execution of the reference's cotangent Laplacian branches
    (`models/utils.py:618-658` + the `cot`/`cotcurv` method branches of
    `laplacian_smoothing` `:696-722`), values AND vertex gradients."""
    import jax

    from fmhr_tpu.core.mesh import laplacian_smoothing

    v, f = _ico_mesh()
    verts = (v + 0.05 * rng.standard_normal((12, 3))).astype(np.float32)

    tv = t(verts).requires_grad_(True)
    want = ref["laplacian_smoothing"](tv, t(f).long(), method=method)
    want.backward()
    want_grad = tv.grad.numpy()

    def ours(vj):
        return laplacian_smoothing(vj, None, None, faces=jnp.asarray(f),
                                   method=method)

    got, got_grad = jax.value_and_grad(ours)(jnp.asarray(verts))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_grad), want_grad,
                               atol=1e-5, rtol=1e-4)


def _exec_ref(path, extra_stubs=()):
    stubs = {}
    for name in (("skimage", "skimage.measure", "plyfile", "trimesh")
                 + tuple(extra_stubs)):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "skimage":
                mod.measure = types.ModuleType("skimage.measure")
            stubs[name] = mod
    sys.modules.update(stubs)
    try:
        ns = {"__name__": "_ref_mod", "__file__": path}
        with open(path) as f:
            exec(compile(f.read(), path, "exec"), ns)
        return ns
    finally:
        for name in stubs:
            sys.modules.pop(name, None)


def test_icosahedron_pe_matches_reference(rng):
    from fmhr_tpu.nn.pe import IcosahedronEncoding

    ns = _exec_ref("/root/reference/models/PostionalEncoding.py")
    ref_pe = ns["PostionalEncoding"](min_deg=0, max_deg=1, scale=0.1)
    ours = IcosahedronEncoding(min_deg=0, max_deg=1, scale=0.1)
    x = rng.standard_normal((5, 7, 3)).astype(np.float32)
    want = ref_pe(t(x)).numpy()
    got = np.asarray(ours(jnp.asarray(x)))
    assert got.shape[-1] == ref_pe.embedding_size
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_rays_match_reference(rng):
    from fmhr_tpu.core.cameras import get_ray_directions, get_rays

    ns = _exec_ref("/root/reference/models/get_rays.py")
    H, W, fx, fy, cx, cy = 24, 30, 200.0, 210.0, 15.2, 11.8
    want_dirs = ns["get_ray_directions"](H, W, fx, fy, cx, cy).numpy()
    got_dirs = get_ray_directions(H, W, fx, fy, cx, cy)
    np.testing.assert_allclose(got_dirs, want_dirs, atol=1e-5)

    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.asarray(
        ref_rot := np.linalg.qr(rng.standard_normal((3, 3)))[0],
        np.float32)
    c2w[:3, 3] = rng.standard_normal(3).astype(np.float32)
    want_d, want_o = ns["get_rays"](t(want_dirs.astype(np.float32)),
                                    t(c2w))
    got_d, got_o = get_rays(got_dirs.astype(np.float32), c2w)
    np.testing.assert_allclose(got_d, want_d.numpy(), atol=1e-5)
    np.testing.assert_allclose(got_o, want_o.numpy(), atol=1e-6)


def test_ncc_matches_reference(rng):
    from fmhr_tpu.core.ncc import ncc

    ns = _exec_ref("/root/reference/models/ncc_utils.py")
    v, n, p = 4, 9, 25
    ref_p = rng.standard_normal((1, n, p)).astype(np.float32)
    src = rng.standard_normal((v, n, p)).astype(np.float32)
    src[1] = ref_p[0] * 2 + 1          # perfectly correlated view
    src_mask = (rng.random((v, n, p)) > 0.3).astype(np.float32)
    src_mask[2, 3] = 0.0               # a fully-masked patch
    want = ns["NCC"](t(ref_p), t(src), t(np.ones_like(ref_p)),
                     t(src_mask)).numpy()
    got = np.asarray(ncc(jnp.asarray(ref_p), jnp.asarray(src),
                         jnp.asarray(src_mask)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sap_dpsr_matches_reference(rng):
    from fmhr_tpu.recon.sap import (
        DPSR, point_rasterize, grid_interp, fftfreqs,
        spec_gaussian_filter)

    ns = _exec_ref("/root/reference/models/sap.py")
    res = (16, 16, 16)
    np.testing.assert_allclose(
        fftfreqs(res), ns["fftfreqs"](res).numpy(), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(spec_gaussian_filter(res, 4.0)).squeeze(),
        ns["spec_gaussian_filter"](res, 4.0).numpy().squeeze(), atol=1e-6)

    pts = rng.random((2, 40, 3)).astype(np.float32) * 0.9 + 0.05
    vals = rng.standard_normal((2, 40, 3)).astype(np.float32)
    for weighted in (False, True):
        want = ns["point_rasterize"](t(pts), t(vals), res,
                                     weighted=weighted).numpy()
        got = np.asarray(point_rasterize(jnp.asarray(pts),
                                         jnp.asarray(vals), res,
                                         weighted=weighted))
        np.testing.assert_allclose(got, want, atol=2e-5)

    grid = rng.standard_normal((2,) + res + (3,)).astype(np.float32)
    want_g = ns["grid_interp"](t(grid), t(pts), batched=True).numpy()
    got_g = np.asarray(grid_interp(jnp.asarray(grid), jnp.asarray(pts)))
    np.testing.assert_allclose(got_g, want_g, atol=2e-5)

    nrm = rng.standard_normal((2, 40, 3)).astype(np.float32)
    ref_dpsr = ns["DPSR"](res, sig=4.0)
    want_phi = ref_dpsr(t(pts), t(nrm)).detach().numpy()
    got_phi = np.asarray(DPSR(res, sig=4.0)(jnp.asarray(pts),
                                            jnp.asarray(nrm)))
    np.testing.assert_allclose(got_phi, want_phi, atol=5e-4)


def test_sfs_shading_matches_reference(rng):
    cv2 = pytest.importorskip("cv2")
    from fmhr_tpu.recon.sfs import estimate_shading, convmtx2

    ns = _exec_ref("/root/reference/models/sfs_utils.py")
    h, w = 20, 24
    # float image on BOTH sides: cv2.cvtColor quantizes uint8 input to
    # 8-bit gray, which is a data-loading artifact, not shading math
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    nrm = rng.standard_normal((h, w, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    mask = rng.random((h, w)) > 0.4
    want_M, want_s, want_g = ns["estimate_shading"](img, nrm, mask)
    got_M, got_s, got_g = estimate_shading(
        jnp.asarray(img, jnp.float64), jnp.asarray(nrm),
        jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_M), want_M, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_s),
                               want_s * mask, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_g)[mask], want_g[mask],
                               atol=1e-3)

    k = rng.standard_normal((3, 3))
    ours = convmtx2(k, (6, 7)).toarray()
    theirs = ns["convmtx2"](k, np.array([6, 7])).toarray()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_pose_optim_stage_matches_reference_execution(tmp_path):
    """WHOLE-STAGE A/B (VERDICT r4 #4): run the reference's actual
    `pose_optim.py` (torch CPU, `.cuda()` neutralized) on demo_data/1 and
    compare loss curve + final keypoints against our `lax.scan`
    triangulation fed the reference's own loaded inputs. The full
    500-epoch record lives in PARITY.md (scripts/ab_pose_optim.py); this
    test runs a 60-epoch prefix.
    """
    data = "/root/reference/demo_data"
    if not os.path.isdir(os.path.join(data, "1", "pose")):
        pytest.skip("demo_data not present")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    try:
        import ab_pose_optim as ab
    finally:
        sys.path.pop(0)

    epochs = 60
    ref_pred, ref_losses, _, ref_inputs = ab.run_reference(
        data, 1, epochs, batch=8)
    our_pred, our_losses, _ = ab.run_ours(ref_inputs, epochs)

    assert np.abs(ref_losses - np.asarray(our_losses)).max() < 5e-4
    span = float(ref_pred.max() - ref_pred.min())
    assert np.abs(ref_pred - our_pred).max() < 5e-3 * span

    # loader parity on the same capture
    ours_in = ab.run_ours_loader(data, 1)
    for a, b in zip(ref_inputs, ours_in):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_smplh_pickle_through_reference_loader(tmp_path):
    """VERDICT r4 #5 (loader-execution half): serialize a synthetic
    52-joint SMPL-H-schema pickle (num_pose=459, sparse J_regressor,
    uint32 kintree root — the layout `models/smplx.py:203-234` accepts
    with is_smplx=False), load it through the reference's OWN SMPLX
    class (executed from /root/reference, torch CPU), and check its
    forward LBS against our ManoModel built from the same arrays.
    """
    import importlib.util
    import pickle

    import scipy.sparse as sp

    from fmhr_tpu.body.mano import ManoModel, mano_forward

    rng = np.random.default_rng(11)
    V, J, S = 40, 52, 10
    v_template = rng.normal(size=(V, 3)).astype(np.float64)
    shapedirs = (rng.normal(size=(V, 3, S)) * 0.03).astype(np.float64)
    posedirs_vcp = (rng.normal(size=(V, 3, (J - 1) * 9)) * 0.01)
    J_reg = rng.random((J, V))
    J_reg /= J_reg.sum(1, keepdims=True)
    weights = rng.random((V, J))
    weights /= weights.sum(1, keepdims=True)
    parents = [0] * J
    for i in range(1, J):
        parents[i] = (i - 1) // 2
    kintree = np.stack([
        np.concatenate([[4294967295], np.asarray(parents[1:], np.uint32)]),
        np.arange(J, dtype=np.uint32),
    ])
    faces = rng.integers(0, V, (30, 3)).astype(np.uint32)

    src = tmp_path / "SMPLH_MALE.pkl"
    with open(src, "wb") as f:
        pickle.dump({
            "v_template": v_template, "shapedirs": shapedirs,
            "posedirs": posedirs_vcp, "J_regressor": sp.csc_matrix(J_reg),
            "weights": weights, "kintree_table": kintree, "f": faces,
        }, f, protocol=2)

    spec = importlib.util.spec_from_file_location(
        "_ref_smplx", "/root/reference/models/smplx.py")
    ref_smplx = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_smplx)
    layer = ref_smplx.SMPLX(str(src), is_smplx=False)

    B = 2
    pose = rng.normal(size=(B, J * 3)).astype(np.float32) * 0.3
    shape = rng.normal(size=(B, S)).astype(np.float32)
    with torch.no_grad():
        want_v, want_j = layer(torch.from_numpy(pose),
                               torch.from_numpy(shape))

    ours = ManoModel(
        v_template=v_template.astype(np.float32),
        shapedirs=shapedirs.astype(np.float32),
        posedirs=np.reshape(posedirs_vcp, (-1, (J - 1) * 9)).T.astype(
            np.float32),
        J_regressor=J_reg.astype(np.float32),
        lbs_weights=weights.astype(np.float32),
        parents=tuple(parents), faces=faces.astype(np.int32),
        hand_mean=np.zeros((J - 1) * 3, np.float32),
        hand_components=np.eye((J - 1) * 3, dtype=np.float32),
        is_rhand=True, tip_vertex_ids=(0, 1, 2, 3, 4),
    )
    got_v, got_j = mano_forward(
        ours, jnp.asarray(pose[:, :3]), jnp.asarray(pose[:, 3:]),
        jnp.asarray(shape), flat_hand_mean=True)
    np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_j), want_j.numpy(), atol=2e-5)
