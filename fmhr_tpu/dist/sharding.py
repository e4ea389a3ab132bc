"""Device-mesh sharding for multi-view inverse rendering.

The reference is single-GPU (SURVEY.md §2.3: no distributed backend at
all); this module IS the scaling story of the rebuild:

- **views axis** (the data-parallel axis of this domain): each device
  rasterizes + shades its shard of the cameras. Per-view losses are local;
  the mean across views makes XLA insert a psum of the scalar and — in the
  backward pass — an all-reduce of the vertex/albedo/SH gradient partials
  over ICI, overlapped with the remaining backward work by the scheduler.
- **rows axis** (the sequence-parallel analog): image rows are sharded so
  one view's pixel grid can span devices. The rasterizer's tile loop is
  pixel-local, so partitioning propagates through it without extra
  communication; only the loss reduction crosses the axis.

Mesh/vertex data stays replicated (49k verts is tiny next to pixels);
gradients for it all-reduce. This follows the standard JAX recipe: build a
`Mesh`, annotate in/out shardings on a jitted step, let GSPMD place the
collectives.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import optax


def make_render_mesh(
    n_views_shards: int | None = None,
    n_row_shards: int = 1,
    devices=None,
) -> Mesh:
    """Mesh with axes ("views", "rows")."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_views_shards is None:
        n_views_shards = n // n_row_shards
    assert n_views_shards * n_row_shards == n, (n_views_shards, n_row_shards, n)
    return Mesh(
        devices.reshape(n_views_shards, n_row_shards), axis_names=("views", "rows")
    )


def shard_views(mesh: Mesh, arr, with_rows: bool = False):
    """Place [N, H, W, ...] with N over 'views' (and H over 'rows')."""
    spec = ["views"]
    if with_rows and np.ndim(arr) >= 2:
        spec.append("rows")
    sharding = NamedSharding(mesh, P(*spec))
    return jax.device_put(jnp.asarray(arr), sharding)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sharding), tree)


def make_sharded_ham_step(
    mesh: Mesh,
    vertices,
    faces,
    topo_edges,
    topo_degrees,
    topo_aa,
    sh_coeffs,
    valid_masks,
    cfg,
    vert_slot_incidence=None,
    nbr_incidence=None,
):
    """Build a jitted, view-sharded HAM Stage-B training step.

    Data arrays (imgs/masks/w2cs/projs/valid_masks) must be pre-sharded
    over the 'views' (and optionally 'rows') axis by the caller;
    parameters (delta, albedo) are replicated. Gradients of replicated
    params against sharded data are psum'd by GSPMD over ICI.

    Returns (init_fn, step_fn) where step_fn(params, opt_state, batch)
    -> (params, opt_state, loss); `batch` is the dict of view-sharded
    arrays for this step.
    """
    from ..optim.ham import project_verts, _masked_l1
    from ..core.mesh import (
        vertex_normals, edge_lengths_sq, laplacian_smoothing, safe_normalize,
    )
    from ..core.sh import sh_radiance
    from ..raster import render_scene, apply_antialias

    vertices = jnp.asarray(vertices)
    faces = jnp.asarray(faces, jnp.int32)
    edges = jnp.asarray(topo_edges)
    degrees = jnp.asarray(topo_degrees)
    edge_mean = jnp.mean(edge_lengths_sq(vertices, faces))
    res = (cfg.height, cfg.width)

    opt = optax.multi_transform(
        {"delta": optax.adam(cfg.lr), "albedo": optax.adam(cfg.albedo_lr)},
        {"delta": "delta", "albedo": "albedo"},
    )

    def loss_fn(params, batch):
        verts = vertices + params["delta"]
        normals = vertex_normals(verts, faces,
                                 incidence=vert_slot_incidence)
        rast, feat, aa_w = render_scene(
            verts, faces, batch["w2cs"], batch["projs"],
            jnp.concatenate(
                [normals, params["albedo"], jnp.ones_like(verts[:, :1])], -1
            ),
            res, aa_topology=topo_aa,
            # on TPU the deferred Pallas core runs under shard_map over
            # the views axis (GSPMD cannot partition a pallas_call); the
            # XLA paths ignore this and partition natively
            mesh=mesh, views_axis="views",
        )
        pred_normals = safe_normalize(feat[..., :3])
        pred_mask = apply_antialias(feat[..., 6:7], aa_w)[..., 0]
        valid = ((batch["masks"] > 0) & (rast[..., 3] > 0)).astype(jnp.float32)
        rad = sh_radiance(
            batch["sh"][:, None, None, :], pred_normals, cfg.degree
        )
        pred = rad[..., None] * feat[..., 3:6]
        tmp_img = jnp.where(valid[..., None] > 0, pred, 0.0)
        tmp_img = apply_antialias(tmp_img, aa_w)

        sfs = cfg.sfs_weight * _masked_l1(tmp_img, batch["imgs"], valid)
        lap = cfg.lap_weight * laplacian_smoothing(
            verts, edges, degrees, nbr_incidence=nbr_incidence)
        mask_l = cfg.mask_weight * jnp.mean((pred_mask - batch["valid_masks"]) ** 2)
        el = edge_lengths_sq(verts, faces)
        edge_l = cfg.edge_weight * jnp.mean(jnp.clip(el - edge_mean, 0.0, 1.0))
        delta_l = cfg.delta_weight * jnp.mean(jnp.sum(params["delta"] ** 2, -1))
        return sfs + lap + mask_l + edge_l + delta_l

    repl = NamedSharding(mesh, P())
    view_spec = NamedSharding(mesh, P("views"))
    img_spec = NamedSharding(mesh, P("views", "rows"))

    def init_fn():
        params = {
            "delta": jnp.zeros_like(vertices),
            "albedo": jnp.full_like(vertices, 0.5),
        }
        params = jax.device_put(params, repl)
        return params, jax.device_put(opt.init(params), repl)

    batch_shardings = {
        "imgs": img_spec, "masks": img_spec, "valid_masks": img_spec,
        "w2cs": view_spec, "projs": view_spec, "sh": view_spec,
    }

    @jax.jit
    def step(params, opt_state, batch):
        loss, g = jax.value_and_grad(loss_fn)(params, batch)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    return init_fn, step, batch_shardings


def make_sharded_nr_step(
    mesh: Mesh,
    vertices,
    faces,
    albedo,
    resolution,
    feat_dim: int = 20,
    mlp_width: int = 64,
    mlp_depth: int = 4,
    lr: float = 1e-4,
    seed: int = 0,
):
    """View-sharded neural-renderer PHASE-1 training step (net +
    per-vertex features; geometry frozen — `optim.neural` phase 1,
    reference `neural_render.py:136-166`).

    Net params and vertex features are replicated; images/rays/cameras
    shard over 'views' (rows optional for the pixel tensors). The
    deferred Pallas core runs under shard_map per view shard; GSPMD
    psums the replicated-parameter gradients over ICI.

    Returns (init_fn, step_fn, batch_shardings); step_fn(params, state,
    batch, rng) -> (params, state, loss). Exercised by the driver's
    dryrun_multichip alongside the HAM step.
    """
    from ..nn.mlp import RenderMLP
    from ..nn.pe import IcosahedronEncoding
    from ..optim.neural import neural_forward

    H, W = resolution
    vertices = jnp.asarray(vertices, jnp.float32)
    albedo = jnp.asarray(albedo, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    V = int(vertices.shape[0])

    pe = IcosahedronEncoding(min_deg=0, max_deg=1, scale=0.1)
    in_dim = pe.embedding_size * 3 + 3 + feat_dim
    net = RenderMLP(width=mlp_width, depth=mlp_depth)
    net_params0 = net.init(jax.random.PRNGKey(seed), jnp.zeros((1, in_dim)))
    opt = optax.adam(lr)

    raster_kw = {"mesh": mesh, "views_axis": "views"}

    def loss_fn(params, batch, rng):
        pred, masks = neural_forward(
            lambda p, x: net.apply(p, x), params["net"], pe,
            batch["rays"], batch["w2cs"], batch["projs"],
            vertices, faces, albedo, params["vf"], (H, W), rng,
            raster_kw=raster_kw,
        )
        valid = ((masks[..., 0] > 0)
                 & (batch["masks"] > 0)).astype(jnp.float32)
        h = optax.huber_loss(pred, batch["imgs"], delta=1.0)
        num = jnp.sum(h * valid[..., None])
        den = jnp.maximum(jnp.sum(valid) * 3, 1.0)
        return 100.0 * num / den

    repl = NamedSharding(mesh, P())
    view_spec = NamedSharding(mesh, P("views"))
    img_spec = NamedSharding(mesh, P("views", "rows"))
    batch_shardings = {
        "imgs": img_spec, "masks": img_spec, "rays": img_spec,
        "w2cs": view_spec, "projs": view_spec,
    }

    def init_fn():
        params = {"net": net_params0, "vf": jnp.zeros((V, feat_dim))}
        params = jax.device_put(params, repl)
        return params, jax.device_put(opt.init(params), repl)

    @jax.jit
    def step(params, opt_state, batch, rng):
        loss, g = jax.value_and_grad(loss_fn)(params, batch, rng)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    return init_fn, step, batch_shardings
