"""Pose-graph optimisation.

Capability-equivalent of extra/PoseGraph.h (:1-396), which wraps Ceres:
keyframe poses with binary relative-pose constraints and optional unary pose
priors (the reference's Vicon alignment). Here the graph is solved with
Gauss-Newton on-device: residuals are SE3 log errors, Jacobians come from
jax.jacfwd, and the stacked 6N normal equations solve densely — appropriate
for the tens-to-hundreds of keyframes the reference targets (its background
solve thread becomes an explicit `optimize` call).
"""
from __future__ import annotations

import dataclasses
import threading
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..solvers.lss import solve_spd


@dataclasses.dataclass
class PoseGraph:
    """Keyframe poses T_wk plus constraints (PoseGraph.h AddKeyframe /
    AddRelativeKeyframe / AddBinaryEdge semantics)."""

    poses: List[np.ndarray] = dataclasses.field(default_factory=list)
    # (i, j, T_ji): measured pose of frame i expressed in frame j
    edges: List[Tuple[int, int, np.ndarray]] = dataclasses.field(default_factory=list)
    # (i, T_wi_measured): unary priors (Vicon-style)
    priors: List[Tuple[int, np.ndarray]] = dataclasses.field(default_factory=list)
    # background solve state (PoseGraph::Start/Stop, PoseGraph.h:376-386)
    _thread: Optional[threading.Thread] = dataclasses.field(
        default=None, repr=False, compare=False)
    _stop_requested: bool = dataclasses.field(
        default=False, repr=False, compare=False)
    running: bool = dataclasses.field(default=False, compare=False)

    def add_keyframe(self, T_wk=None) -> int:
        self.poses.append(
            np.asarray(T_wk if T_wk is not None else se3.identity(), np.float32)
        )
        return len(self.poses) - 1

    def add_relative_edge(self, i: int, j: int, T_ji) -> None:
        """Constrain T_jw * T_wi = T_ji."""
        self.edges.append((i, j, np.asarray(T_ji, np.float32)))

    def add_prior(self, i: int, T_wi) -> None:
        self.priors.append((i, np.asarray(T_wi, np.float32)))

    def optimize(self, iterations: int = 10, damping: float = 1e-4,
                 fix_first: bool = True) -> float:
        """Gauss-Newton over all poses; returns the final residual norm."""
        n = len(self.poses)
        if n == 0:
            return 0.0
        poses0 = jnp.asarray(np.stack(self.poses))  # (n, 3, 4)
        edges = [(i, j, jnp.asarray(T)) for i, j, T in self.edges]
        priors = [(i, jnp.asarray(T)) for i, T in self.priors]

        def residuals(xi_flat, poses):
            xi = xi_flat.reshape(n, 6)
            Ts = [se3.compose(se3.exp(xi[k]), poses[k]) for k in range(n)]
            rs = []
            for i, j, T_ji in edges:
                T_err = se3.compose(
                    se3.inverse(T_ji), se3.compose(se3.inverse(Ts[j]), Ts[i])
                )
                rs.append(se3.log(T_err))
            for i, T_wi in priors:
                rs.append(se3.log(se3.compose(se3.inverse(T_wi), Ts[i])))
            return jnp.concatenate(rs) if rs else jnp.zeros((0,))

        poses = poses0
        final = 0.0
        for _ in range(iterations):
            if self._stop_requested:
                break
            x0 = jnp.zeros(n * 6)
            J = jax.jacfwd(residuals)(x0, poses)
            r = residuals(x0, poses)
            if fix_first:
                mask = jnp.ones(n * 6).at[:6].set(0.0)
                J = J * mask[None, :]
            dx = -solve_spd(J.T @ J, J.T @ r, damping)
            if fix_first:
                dx = dx.at[:6].set(0.0)
            xi = dx.reshape(n, 6)
            poses = jnp.stack([se3.compose(se3.exp(xi[k]), poses[k]) for k in range(n)])
            final = float(jnp.linalg.norm(residuals(jnp.zeros(n * 6), poses)))
        self.poses = [np.asarray(poses[k]) for k in range(n)]
        return final

    # --- background solve (PoseGraph::Start/Stop + Solve thread,
    #     PoseGraph.h:357-386) -------------------------------------------
    def start(self, iterations: int = 100, damping: float = 1e-4,
              fix_first: bool = True) -> None:
        """Kick off the solve on a background thread, like the reference's
        Ceres `optThread`. Poses update in place when it finishes; poll
        `running` or call `stop()`/`join()`."""
        if self.running:
            return
        self._stop_requested = False
        self.running = True

        def run():
            try:
                self.optimize(iterations=iterations, damping=damping,
                              fix_first=fix_first)
            finally:
                self.running = False

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        """Request the background solve to stop after the current iteration
        (boost::thread::interrupt analogue) and wait for it."""
        self._stop_requested = True
        self.join()

    def join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def load_poses_from_file(path: str):
    """Load a pose trajectory text file: one pose per line, either 12 values
    (row-major 3x4) or 6 values (x y z roll pitch yaw, the mvl convention of
    extra/LoadPosesFromFile.h). Returns a list of (3, 4) float32 arrays."""
    poses = []
    with open(path) as f:
        for line in f:
            vals = [float(v) for v in line.replace(",", " ").split()]
            if len(vals) == 12:
                poses.append(np.asarray(vals, np.float32).reshape(3, 4))
            elif len(vals) == 6:
                x, y, z, r, p, q = vals
                cr, sr = np.cos(r), np.sin(r)
                cp, sp = np.cos(p), np.sin(p)
                cq, sq = np.cos(q), np.sin(q)
                Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
                Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
                Rz = np.array([[cq, -sq, 0], [sq, cq, 0], [0, 0, 1]])
                R = Rz @ Ry @ Rx
                T = np.concatenate([R, [[x], [y], [z]]], axis=1)
                poses.append(T.astype(np.float32))
            elif vals:
                raise ValueError(f"unsupported pose line with {len(vals)} values")
    return poses


def save_poses_to_file(path: str, poses) -> None:
    """Write a trajectory as 12-value row-major 3x4 lines — the inverse of
    :func:`load_poses_from_file` and the exportable form of the reference's
    GLCameraHistory pose log."""
    with open(path, "w") as f:
        for T in poses:
            vals = np.asarray(T, np.float32).reshape(-1)
            f.write(" ".join(f"{v:.9g}" for v in vals) + "\n")
