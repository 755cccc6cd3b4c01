"""Multi-chip scaling: sharded frame extraction and sharded bundle
adjustment over a jax.sharding.Mesh.

The reference's parallelism is 4 POSIX threads over a mutex-protected
map (SURVEY §2.4) — nothing scales across devices.  The TPU-native
scaling story (SURVEY §5.8) is:

  - **frame-parallel ("dp")**: batches of frames (stereo pairs, or the
    keyframes of a mapping window) are extracted with the fused ORB
    frontend vmapped over the batch and sharded across chips — each chip
    runs the full frontend for its shard, no cross-chip traffic until
    the gather.
  - **edge-parallel BA ("dp")**: global bundle adjustment shards the
    observation-edge arrays across chips; per-edge residual/Jacobian/
    H-block computation is local, and the segment-sums that assemble
    Hcc/Hpp/gradients become XLA all-reduces over the mesh (psum riding
    ICI).  Cameras and points are replicated (they are tiny compared to
    edges).

Both paths are expressed with `NamedSharding` annotations and jit —
XLA inserts the collectives (the scaling-book recipe), no hand-written
NCCL-style code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam2_tpu.ops import frontend
from orb_slam2_tpu.solvers import ba


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# ---------------------------------------------------------------------------
# frame-parallel extraction
# ---------------------------------------------------------------------------

def extract_batch_sharded(
    mesh: Mesh,
    imgs: np.ndarray,
    n_features: int = 500,
    n_levels: int = 8,
    scale_factor: float = 1.2,
):
    """Extract ORB features for a batch of frames, sharded over the mesh.

    imgs: (B, H, W) with B divisible by mesh size.  Returns Features with
    a leading batch dim, sharded on the same axis.
    """
    sharding = NamedSharding(mesh, P("dp", None, None))
    imgs_d = jax.device_put(jnp.asarray(imgs), sharding)

    fn = jax.jit(
        jax.vmap(
            lambda im: frontend.extract.__wrapped__(
                im, n_features, n_levels, scale_factor, 20, 7, 24
            )
        ),
        in_shardings=(sharding,),
    )
    return fn(imgs_d)


# ---------------------------------------------------------------------------
# frame-parallel FULL tracking step (multi-camera rig / multi-session
# mapping): the complete fused per-frame program — frontend, motion-model
# matching, pose LM, local-map matching, second pose LM — vmapped over a
# batch of frames and sharded one frame per device.
# ---------------------------------------------------------------------------

def track_step_sharded(mesh: Mesh, settings, imgs_l, imgs_r,
                       scal, last_f32, last_desc, last_oct, last_ang,
                       loc_f32, loc_desc):
    """Run the full fused track step for B frames sharded over the mesh.

    imgs_l/imgs_r: (B, H, W); every other argument is the single-frame
    step's input with a leading B axis (see slam/track_step.py::step).
    Returns the packed f32 outputs (B, ...) sharded the same way.
    """
    from orb_slam2_tpu.slam import track_step as ts

    step = ts.build_track_step(settings, sensor_stereo=True)

    s3 = NamedSharding(mesh, P("dp", None, None))
    s2 = NamedSharding(mesh, P("dp", None))

    def put(x, s):
        return jax.device_put(jnp.asarray(x), s)

    shardings = (s3, s3, s2, s3, s3, s2, s2, s3, s3)
    fn = jax.jit(
        jax.vmap(lambda *a: step.__wrapped__(*a).f32_pack),
        in_shardings=shardings,
    )
    args = (imgs_l, imgs_r, scal, last_f32, last_desc, last_oct,
            last_ang, loc_f32, loc_desc)
    return fn(*(put(a, s) for a, s in zip(args, shardings)))


# ---------------------------------------------------------------------------
# edge-parallel global bundle adjustment
# ---------------------------------------------------------------------------

def shard_ba_problem(mesh: Mesh, prob: ba.BAProblem) -> ba.BAProblem:
    """Lay out the BA problem for the mesh: edges sharded on "dp",
    cameras/points replicated."""
    edge = NamedSharding(mesh, P("dp"))
    edge2 = NamedSharding(mesh, P("dp", None))
    rep = NamedSharding(mesh, P())
    return ba.BAProblem(
        cam_T=jax.device_put(prob.cam_T, rep),
        cam_fixed=jax.device_put(prob.cam_fixed, rep),
        cam_mask=jax.device_put(prob.cam_mask, rep),
        pts=jax.device_put(prob.pts, rep),
        pt_mask=jax.device_put(prob.pt_mask, rep),
        edge_cam=jax.device_put(prob.edge_cam, edge),
        edge_pt=jax.device_put(prob.edge_pt, edge),
        edge_uv=jax.device_put(prob.edge_uv, edge2),
        edge_inv_sigma2=jax.device_put(prob.edge_inv_sigma2, edge),
        edge_mask=jax.device_put(prob.edge_mask, edge),
    )


def optimize_sharded(mesh: Mesh, prob: ba.BAProblem, fx, fy, cx, cy, bf,
                     iters: int = 5, mode: str = "cg"):
    """Run Schur-LM bundle adjustment with edges sharded over the mesh.

    The per-edge work partitions cleanly; XLA turns the segment-sum
    H/g assembly into psum collectives over "dp"."""
    sharded = shard_ba_problem(mesh, prob)
    with mesh:
        return ba.optimize(
            sharded, fx, fy, cx, cy, bf, iters=iters,
            use_kernel=True, mode=mode,
        )


# ---------------------------------------------------------------------------
# synthetic problem for dry runs
# ---------------------------------------------------------------------------

def synthetic_ba_problem(n_cams: int = 8, n_pts: int = 128,
                         n_edges: int = 1024, seed: int = 0) -> ba.BAProblem:
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, (n_pts, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    cam_T = np.tile(np.eye(4, dtype=np.float32), (n_cams, 1, 1))
    cam_T[:, 0, 3] = np.linspace(0, 1, n_cams)
    fx = fy = 300.0
    cx, cy = 160.0, 120.0
    e_cam = rng.integers(0, n_cams, n_edges)
    e_pt = rng.integers(0, n_pts, n_edges)
    pc = np.einsum(
        "eij,ej->ei", cam_T[e_cam, :3, :3], pts[e_pt]
    ) + cam_T[e_cam, :3, 3]
    u = fx * pc[:, 0] / pc[:, 2] + cx
    v = fy * pc[:, 1] / pc[:, 2] + cy
    uv = np.stack([u, v, -np.ones_like(u)], -1).astype(np.float32)
    uv[:, :2] += rng.normal(0, 0.5, (n_edges, 2))
    cam_fixed = np.zeros(n_cams, bool)
    cam_fixed[0] = True
    return ba.BAProblem(
        jnp.asarray(cam_T), jnp.asarray(cam_fixed),
        jnp.asarray(np.ones(n_cams, bool)),
        jnp.asarray(pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)),
        jnp.asarray(np.ones(n_pts, bool)),
        jnp.asarray(e_cam.astype(np.int32)),
        jnp.asarray(e_pt.astype(np.int32)),
        jnp.asarray(uv),
        jnp.asarray(np.ones(n_edges, np.float32)),
        jnp.asarray(np.ones(n_edges, bool)),
    ), (fx, fy, cx, cy, 0.0)
