"""Cross-shard pose-graph refinement on the device mesh.

The window stitcher (:func:`davo_tpu.train.vo_eval.stitch_windows_global`)
solves two small global systems — a rotation-graph Gauss–Newton and a
joint centre/scale least squares — from every window-overlap edge.  The
host version materialises dense rectangular systems; this module is the
*on-mesh* formulation the BASELINE north star asks for ("pose-graph
refinement across shard boundaries"): window edges are sharded over a mesh
axis, every shard reduces its edges into the (tiny, dense) normal
equations with one ``psum``, and the replicated solves/updates run
identically on all devices.  For 16-frame toy sequences this is overkill;
the structure is what matters — edge count scales with sequence length and
window overlap, and the per-edge work (SO(3) logs, outer products) is the
part that must scale out.

Both solves exploit structure the host version leaves to ``lstsq``:

* the rotation system decouples per tangent component — all three share
  one graph Laplacian ``L = sum_e (h_f - h_s)(h_f - h_s)^T`` over frame
  indicator differences, so one ``(K-1, K-1)`` factorisation serves a
  3-column solve;
* the centre/scale system is assembled blockwise: the same Laplacian per
  centre component, an edge-summed centre-scale coupling block, and a
  diagonal scale block.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from davo_tpu.utils import full_f32_matmuls
from davo_tpu.geometry import axis_angle_from_matrix, so3_rotation_matrix

__all__ = ["WindowEdges", "build_window_edges", "distributed_stitch_windows"]


class WindowEdges(NamedTuple):
    """Flat edge arrays of the window-overlap graph (padded).

    * ``start``/``frame``: ``(E,)`` int32 frame indices (edge constrains
      ``R[frame] = rel_rot @ R[start]``).
    * ``rel_rot``: ``(E, 3, 3)`` window-relative rotations.
    * ``centre``: ``(E, 3)`` window-frame camera centre of ``frame``
      relative to ``start`` (arbitrary per-window gauge scale).
    * ``window``: ``(E,)`` int32 owning-window index.
    * ``weight``: ``(E,)`` 1 for real edges, 0 for padding.
    """

    start: jax.Array
    frame: jax.Array
    rel_rot: jax.Array
    centre: jax.Array
    window: jax.Array
    weight: jax.Array


def build_window_edges(
    starts: Sequence[int], window_poses: List[jax.Array], pad_to: int = 1
) -> WindowEdges:
    """Edge arrays from per-window relative poses (static structure).

    :param starts: window anchor frames.
    :param window_poses: list of ``(w, 6)`` window-relative poses (frame
        ``starts[i]`` is the identity of window ``i``).
    :param pad_to: pad the edge count to a multiple (mesh axis size).
    """
    s_idx, f_idx, rels, centres, wins = [], [], [], [], []
    for wi, s in enumerate(starts):
        wp = window_poses[wi]
        w = wp.shape[0]
        rel_rot = so3_rotation_matrix(wp[:, 0:3])
        for j in range(1, w):
            s_idx.append(s)
            f_idx.append(s + j)
            rels.append(rel_rot[j])
            # camera centre of frame j in the window's anchor frame
            centres.append(-rel_rot[j].T @ wp[j, 3:6])
            wins.append(wi)
    e = len(s_idx)
    pad = (-e) % max(pad_to, 1)
    dtype = window_poses[0].dtype
    eye = jnp.eye(3, dtype=dtype)
    return WindowEdges(
        start=jnp.asarray(s_idx + [0] * pad, jnp.int32),
        frame=jnp.asarray(f_idx + [0] * pad, jnp.int32),
        rel_rot=jnp.concatenate(
            [jnp.stack(rels), jnp.broadcast_to(eye, (pad, 3, 3))]
        )
        if pad
        else jnp.stack(rels),
        centre=jnp.concatenate([jnp.stack(centres), jnp.zeros((pad, 3), dtype)])
        if pad
        else jnp.stack(centres),
        window=jnp.asarray(wins + [0] * pad, jnp.int32),
        weight=jnp.concatenate(
            [jnp.ones(e, dtype), jnp.zeros(pad, dtype)]
        ),
    )


def _frame_indicator_diff(edges: WindowEdges, num_frames: int) -> jax.Array:
    """``(E, K-1)`` rows ``h_frame - h_start`` over the free frames 1..K-1
    (frame 0 is the gauge anchor and has no column)."""
    dtype = edges.rel_rot.dtype
    hf = jax.nn.one_hot(edges.frame - 1, num_frames - 1, dtype=dtype)
    hs = jnp.where(
        (edges.start > 0)[:, None],
        jax.nn.one_hot(edges.start - 1, num_frames - 1, dtype=dtype),
        0.0,
    )
    return (hf - hs) * edges.weight[:, None]


@full_f32_matmuls
def distributed_stitch_windows(
    starts: Sequence[int],
    window_poses: List[jax.Array],
    num_frames: int,
    mesh: Mesh,
    axis_name: str = "data",
    rotation_iterations: int = 2,
) -> jax.Array:
    """Overlap-consistent global stitching with edges sharded over a mesh.

    Mathematically equivalent to
    :func:`davo_tpu.train.vo_eval.stitch_windows_global` (the 1-device ==
    N-device equality test pins this down); communication per rotation
    iteration is one ``psum`` of a ``(K-1, K-1)`` Laplacian + ``(K-1, 3)``
    rhs, and one psum of the centre/scale normal blocks at the end.

    :return: ``(K, 6)`` absolute world->camera poses.
    """
    kf = num_frames
    n_win = len(starts)
    axis_size = mesh.shape[axis_name]
    edges = build_window_edges(starts, window_poses, pad_to=axis_size)
    dtype = edges.rel_rot.dtype

    # greedy chaining seed (host loop over the static window structure)
    rel_rots = [so3_rotation_matrix(wp[:, 0:3]) for wp in window_poses]
    rot_list = [None] * kf
    rot_list[0] = jnp.eye(3, dtype=dtype)
    for wi, s in enumerate(starts):
        w = window_poses[wi].shape[0]
        for j in range(1, w):
            if rot_list[s + j] is None:
                rot_list[s + j] = rel_rots[wi][j] @ rot_list[s]
    rot = jnp.stack(rot_list)  # (K, 3, 3)

    edge_specs = WindowEdges(
        start=P(axis_name),
        frame=P(axis_name),
        rel_rot=P(axis_name),
        centre=P(axis_name),
        window=P(axis_name),
        weight=P(axis_name),
    )

    def rotation_normals(rot_rep, shard: WindowEdges):
        """Per-shard reduction of the rotation-graph GN normal equations."""
        hd = _frame_indicator_diff(shard, kf)  # (E_loc, K-1)
        r_s = rot_rep[shard.start]  # (E_loc, 3, 3)
        r_f = rot_rep[shard.frame]
        resid = axis_angle_from_matrix(
            jnp.einsum("eij,ekj->eik", r_f, jnp.einsum("eij,ejk->eik", shard.rel_rot, r_s))
        )  # log(R_f (R_rel R_s)^T)
        resid = resid * shard.weight[:, None]
        lap = jax.lax.psum(jnp.einsum("ep,eq->pq", hd, hd), axis_name)
        rhs = jax.lax.psum(jnp.einsum("ep,ej->pj", hd, -resid), axis_name)
        return lap, rhs

    rotation_normals_sharded = jax.shard_map(
        rotation_normals,
        mesh=mesh,
        in_specs=(P(), edge_specs),
        out_specs=(P(), P()),
    )

    eps = jnp.asarray(1e-9, dtype)
    eye_k = jnp.eye(kf - 1, dtype=dtype)
    for _ in range(max(0, rotation_iterations)):
        lap, rhs = rotation_normals_sharded(rot, edges)
        delta = jnp.linalg.solve(lap + eps * eye_k, rhs)  # (K-1, 3)
        rot_upd = so3_rotation_matrix(delta)  # (K-1, 3, 3)
        rot = jnp.concatenate(
            [rot[0:1], jnp.einsum("kij,kjl->kil", rot_upd, rot[1:])]
        )

    def centre_normals(rot_rep, shard: WindowEdges):
        """Per-shard reduction of the joint centre/scale least squares."""
        hd = _frame_indicator_diff(shard, kf)  # (E_loc, K-1)
        # d_e = R[start]^T cw — the centre offset in world orientation
        d = jnp.einsum(
            "eji,ej->ei", rot_rep[shard.start], shard.centre
        ) * shard.weight[:, None]  # (E_loc, 3)
        is_win0 = (shard.window == 0).astype(dtype)
        wsel = (
            jax.nn.one_hot(shard.window - 1, n_win - 1, dtype=dtype)
            * (1.0 - is_win0)[:, None]
            * shard.weight[:, None]
        )  # (E_loc, W-1), zero rows for window 0 + padding
        lap = jax.lax.psum(jnp.einsum("ep,eq->pq", hd, hd), axis_name)
        cs = jax.lax.psum(
            jnp.einsum("ep,ew,ej->pwj", hd, wsel, -d), axis_name
        )  # (K-1, W-1, 3)
        ss = jax.lax.psum(
            jnp.einsum("ew,e->w", wsel, jnp.sum(d * d, axis=-1)), axis_name
        )  # (W-1,)
        bc = jax.lax.psum(
            jnp.einsum("ep,ej->pj", hd * is_win0[:, None], d), axis_name
        )  # (K-1, 3)
        return lap, cs, ss, bc

    centre_normals_sharded = jax.shard_map(
        centre_normals,
        mesh=mesh,
        in_specs=(P(), edge_specs),
        out_specs=(P(), P(), P(), P()),
    )
    lap, cs, ss, bc = centre_normals_sharded(rot, edges)

    # assemble the dense (3(K-1) + (W-1)) normal system: unknowns are the
    # free camera centres (component-major: [c_1x..c_1z, ...]) + scales
    nc = 3 * (kf - 1)
    nu = nc + (n_win - 1)
    eye3 = jnp.eye(3, dtype=dtype)
    ata = jnp.zeros((nu, nu), dtype)
    ata = ata.at[:nc, :nc].set(jnp.kron(lap, eye3))
    cs_flat = cs.reshape(kf - 1, (n_win - 1), 3)
    cs_block = jnp.transpose(cs_flat, (0, 2, 1)).reshape(nc, n_win - 1)
    ata = ata.at[:nc, nc:].set(cs_block)
    ata = ata.at[nc:, :nc].set(cs_block.T)
    ata = ata.at[nc:, nc:].set(jnp.diag(ss))
    atb = jnp.concatenate([bc.reshape(nc), jnp.zeros(n_win - 1, dtype)])
    solution = jnp.linalg.solve(
        ata + jnp.asarray(1e-9, dtype) * jnp.eye(nu, dtype=dtype), atb
    )
    centres = jnp.concatenate(
        [jnp.zeros((1, 3), dtype), solution[:nc].reshape(kf - 1, 3)]
    )
    t_all = -jnp.einsum("kij,kj->ki", rot, centres)
    return jnp.concatenate([axis_angle_from_matrix(rot), t_all], axis=-1)
