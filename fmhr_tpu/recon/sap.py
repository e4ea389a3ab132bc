"""Shape-As-Points: differentiable Poisson surface reconstruction (DPSR).

TPU-native rebuild of `/root/reference/models/sap.py` (vestigial in the
reference release — no entry point reaches it — carried for completeness
per SURVEY §1). Given an oriented point cloud, solve the Poisson equation
∇²φ = ∇·(smoothed point normals) spectrally and extract the zero level
set as a mesh, with gradients flowing back to the point positions and
normals.

TPU mapping: the whole field pipeline (trilinear point rasterization →
3D real FFT → spectral divide → inverse FFT → trilinear sampling) is
jittable JAX; FFTs and the gather/scatter run on device. Only the
isosurface extraction (dynamic vertex/face counts) runs on the host via
`jax.pure_callback` into a static-shape pad, with the surface gradient
dV/dφ = -n̂ hand-written as a custom_vjp (`PSR2Mesh`,
`/root/reference/models/sap.py:247-282`) — a trilinear splat of the
vertex cotangents, i.e. exactly `point_rasterize`.

Parity notes (formulas match `/root/reference/models/sap.py`):
- `point_rasterize` (:147-207): trilinear scatter with periodic index
  wrap; `weighted=True` divides by the contribution COUNT (not the weight
  sum), bug-for-bug.
- `DPSR.forward` (:285-343): gaussian spectral filter exp(-½(2σ|ω|/r)²),
  divergence -i·2πω·N̂, Laplacian -(2πω)², the `1e-6` added to the
  NEGATIVE eigenvalues, DC zeroed, then the shift (zero mean at the input
  points) and scale (-φ/|φ[0,0,0]|·0.5, the corner value detached).
- `sap_generate` (:346-357): sigmoid on raw points, tanh on the field.
"""

from __future__ import annotations

import functools
import itertools

import numpy as np
import jax
import jax.numpy as jnp

from .marching import marching_tets


# --------------------------------------------------------------------------
# Trilinear scatter / gather on the unit cube
# --------------------------------------------------------------------------

def _corner_indices_weights(pts, size):
    """Shared trilinear setup. pts [..., d] in [0, 1); returns per-corner
    (index tuple list, weight) pairs with periodic wrap of the +1 node."""
    d = pts.shape[-1]
    size_i = np.asarray(size, np.int32)
    x = pts * jnp.asarray(size_i, pts.dtype)
    i0 = jnp.floor(x).astype(jnp.int32)
    frac = x - i0.astype(pts.dtype)
    i0w = jnp.remainder(i0, size_i)
    i1w = jnp.remainder(i0 + 1, size_i)
    out = []
    for corner in itertools.product((0, 1), repeat=d):
        idx = [i1w[..., k] if corner[k] else i0w[..., k] for k in range(d)]
        w = 1.0
        for k in range(d):
            w = w * (frac[..., k] if corner[k] else 1.0 - frac[..., k])
        out.append((idx, w))
    return out


def point_rasterize(pts, vals, size, weighted: bool = False):
    """Trilinear scatter of point values onto a periodic grid.

    pts [b, n, d] in [0, 1); vals [b, n, f]; returns [b, f, *size].
    Parity: `/root/reference/models/sap.py:147-207` (weighted variant
    divides by the contribution count, :128-145).
    """
    b, n, d = pts.shape
    f = vals.shape[-1]
    R = int(np.prod(size))
    strides = np.cumprod([1] + list(size[::-1]))[::-1][1:]  # row-major
    bidx = jnp.arange(b)[:, None]
    out = jnp.zeros((b, R, f), vals.dtype)
    cnt = jnp.zeros((b, R), vals.dtype)
    for idx, w in _corner_indices_weights(pts, size):
        flat = sum(idx[k] * int(strides[k]) for k in range(d))  # [b, n]
        out = out.at[bidx, flat].add(w[..., None] * vals)
        if weighted:
            cnt = cnt.at[bidx, flat].add(jnp.ones_like(w))
    if weighted:
        out = out / jnp.maximum(cnt, 1.0)[..., None]
    out = out.reshape((b,) + tuple(size) + (f,))
    return jnp.moveaxis(out, -1, 1)


def grid_interp(grid, pts):
    """Trilinear sample of `grid` [b, *size, f] at pts [b, n, d] in
    [0, 1). Exact adjoint of unweighted `point_rasterize`.
    Parity: `/root/reference/models/sap.py:59-102`.
    """
    size = grid.shape[1:-1]
    b = grid.shape[0]
    f = grid.shape[-1]
    R = int(np.prod(size))
    strides = np.cumprod([1] + list(size[::-1]))[::-1][1:]
    gflat = grid.reshape(b, R, f)
    bidx = jnp.arange(b)[:, None]
    out = 0.0
    for idx, w in _corner_indices_weights(pts, size):
        flat = sum(idx[k] * int(strides[k]) for k in range(len(size)))
        out = out + w[..., None] * gflat[bidx, flat]
    return out


# --------------------------------------------------------------------------
# Spectral Poisson solver
# --------------------------------------------------------------------------

def fftfreqs(res):
    """Frequency lattice [*res[:-1], res[-1]//2+1, d] (rfft on the last
    axis). Parity: `/root/reference/models/sap.py:9-31`."""
    freqs = [np.fft.fftfreq(r, d=1.0 / r) for r in res[:-1]]
    freqs.append(np.fft.rfftfreq(res[-1], d=1.0 / res[-1]))
    omega = np.meshgrid(*freqs, indexing="ij")
    return np.stack(omega, axis=-1).astype(np.float64)


def spec_gaussian_filter(res, sig):
    """exp(-½ (σ·2|ω|/res₀)²), computed in float64 like the reference
    (`/root/reference/models/sap.py:34-40`)."""
    omega = fftfreqs(res)
    dis = np.sqrt((omega ** 2).sum(-1))
    return np.exp(-0.5 * ((sig * 2.0 * dis / res[0]) ** 2))


class DPSR:
    """Differentiable Poisson solver: oriented points -> indicator field.

    `DPSR((r, r, r), sig)(points [b, n, 3], normals [b, n, 3])` returns
    φ [b, r, r, r]. Jittable and differentiable end to end. Parity:
    `/root/reference/models/sap.py:285-343`.
    """

    def __init__(self, res, sig=10.0, scale=True, shift=True,
                 weighted=False):
        self.res = tuple(int(r) for r in res)
        self.dim = len(self.res)
        self.sig = float(sig)
        self.scale = scale
        self.shift = shift
        self.weighted = weighted
        self.G = spec_gaussian_filter(self.res, sig).astype(np.float32)
        self.omega = fftfreqs(self.res).astype(np.float32)

    def __call__(self, points, normals):
        res = self.res
        axes = tuple(range(2, 2 + self.dim))
        ras_p = point_rasterize(points, normals, res,
                                weighted=self.weighted)   # [b, d, *res]
        ras_s = jnp.fft.rfftn(ras_p, axes=axes)           # [b, d, *resc]
        N_ = ras_s * jnp.asarray(self.G)[None, None]
        omega = jnp.asarray(self.omega) * (2.0 * np.pi)   # [*resc, d]
        div = -1j * jnp.sum(
            jnp.moveaxis(N_, 1, -1) * omega.astype(N_.dtype), axis=-1)
        lap = -jnp.sum(omega ** 2, axis=-1)               # [*resc]
        phi_s = div / (lap + 1e-6)[None]
        phi_s = phi_s.at[(slice(None),) + (0,) * self.dim].set(0.0)
        phi = jnp.fft.irfftn(phi_s, s=res, axes=tuple(range(1, 1 + self.dim)))

        if self.shift or self.scale:
            fv = grid_interp(phi[..., None], points)[..., 0]   # [b, n]
            if self.shift:
                phi = phi - jnp.mean(fv, axis=-1).reshape(
                    (-1,) + (1,) * self.dim)
            fv0 = jax.lax.stop_gradient(
                phi[(slice(None),) + (0,) * self.dim])         # [b]
            if self.scale:
                phi = -phi / jnp.abs(fv0).reshape(
                    (-1,) + (1,) * self.dim) * 0.5
        return phi


# --------------------------------------------------------------------------
# Isosurface extraction with surface gradients (PSR2Mesh role)
# --------------------------------------------------------------------------

def _host_mc(psr, max_verts, max_faces):
    grid = np.asarray(psr[0], np.float32)
    verts, faces, normals = marching_tets(grid, level=0.0)
    nv = min(len(verts), max_verts)
    nf = min(len(faces), max_faces)
    vpad = np.zeros((max_verts, 3), np.float32)
    npad = np.zeros((max_verts, 3), np.float32)
    fpad = np.zeros((max_faces, 3), np.int32)
    vpad[:nv] = verts[:nv]
    npad[:nv] = normals[:nv]
    keep = faces[(faces < nv).all(1)][:max_faces]
    nf = len(keep)
    fpad[:nf] = keep
    return (vpad, fpad, npad,
            np.int32(nv), np.int32(nf))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def psr_to_mesh(psr, max_verts: int, max_faces: int):
    """Zero level set of φ [1, r, r, r] as (verts [1, max_verts, 3] in
    [0, 1), faces [max_faces, 3] int32, normals, nv, nf) — padded to
    static shapes (counts nv/nf trim them outside jit).

    Differentiable in φ via the level-set relation dV/dφ = -n̂ splatted
    back onto the grid (`PSR2Mesh`,
    `/root/reference/models/sap.py:247-282`).
    """
    out, _ = _psr_to_mesh_fwd(psr, max_verts, max_faces)
    return out


def _psr_to_mesh_fwd(psr, max_verts, max_faces):
    r = psr.shape[1:]
    shapes = (
        jax.ShapeDtypeStruct((max_verts, 3), jnp.float32),
        jax.ShapeDtypeStruct((max_faces, 3), jnp.int32),
        jax.ShapeDtypeStruct((max_verts, 3), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    vpad, fpad, npad, nv, nf = jax.pure_callback(
        functools.partial(_host_mc, max_verts=max_verts,
                          max_faces=max_faces),
        shapes, psr)
    verts = vpad[None]
    out = (verts, fpad, npad[None], nv, nf)
    return out, (verts, npad[None], r)


def _psr_to_mesh_bwd(max_verts, max_faces, saved, cts):
    verts, normals, res = saved
    dV = cts[0]                                           # [1, max_v, 3]
    g = jnp.sum(dV * (-normals), axis=-1, keepdims=True)  # [1, max_v, 1]
    grad_grid = point_rasterize(verts, g, res, weighted=False)
    return (grad_grid[:, 0],)


psr_to_mesh.defvjp(_psr_to_mesh_fwd, _psr_to_mesh_bwd)


# --------------------------------------------------------------------------
# High-level helpers
# --------------------------------------------------------------------------

def sap_transform(verts, center, scale, inverse: bool = False):
    """Map between world coords and the SAP unit cube.
    Parity: `/root/reference/models/sap.py:360-371`."""
    if inverse:
        return (verts * 2.0 - 1.0) * scale + center
    return ((verts - center) / scale + 1.0) / 2.0


def sap_generate(dpsr: DPSR, inputs, center, scale, *,
                 max_verts: int = 1 << 16, max_faces: int = 1 << 17):
    """inputs [1, n, 6] = [raw points (pre-sigmoid) | normals]. Returns
    (vertices [nv≤max, 3] world coords (padded), faces [nf≤max, 3],
    unit-cube verts, φ grid, sigmoid points, nv, nf).
    Parity: `/root/reference/models/sap.py:374-387`.
    """
    points, normals = jnp.split(inputs, 2, axis=2)
    points = jax.nn.sigmoid(points)
    psr = jnp.tanh(dpsr(points, normals))
    v, faces, _, nv, nf = psr_to_mesh(psr, max_verts, max_faces)
    vertices = sap_transform(v, center, scale, inverse=True)[0]
    return vertices, faces, v, psr, points, nv, nf


def sample_surface(verts, faces, num_sample, seed=0):
    """Area-weighted uniform surface samples with face normals (host).
    Role of trimesh's `sample_surface_even` in `gen_inputs`
    (`/root/reference/models/sap.py:390-417`)."""
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(n, axis=1)
    nrm = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    rng = np.random.default_rng(seed)
    fid = rng.choice(len(faces), size=num_sample,
                     p=area / max(area.sum(), 1e-20))
    r1 = np.sqrt(rng.random(num_sample))
    r2 = rng.random(num_sample)
    a, b, c = tri[fid, 0], tri[fid, 1], tri[fid, 2]
    pts = (1 - r1)[:, None] * a + (r1 * (1 - r2))[:, None] * b \
        + (r1 * r2)[:, None] * c
    return pts.astype(np.float32), nrm[fid].astype(np.float32)


def gen_inputs(verts, faces, num_sample: int = 10000, seed: int = 0):
    """Build the SAP optimization input from a mesh: center/scale to the
    unit cube, sample oriented surface points, inverse-sigmoid the
    positions. Returns (inputs [1, n, 6], center [3], scale []).
    Parity: `/root/reference/models/sap.py:390-417`.
    """
    verts = np.asarray(verts, np.float32)
    center = verts.mean(0)
    scale = np.abs(verts - center).max() * 1.2
    unit = ((verts - center) / scale + 1.0) / 2.0
    pts, nrm = sample_surface(unit, faces, num_sample, seed=seed)
    pts = np.clip(pts, 1e-6, 1 - 1e-6)
    raw = np.log(pts / (1.0 - pts))
    inputs = np.concatenate([raw, nrm], axis=-1)[None]
    return (jnp.asarray(inputs), jnp.asarray(center),
            jnp.asarray(np.float32(scale)))
