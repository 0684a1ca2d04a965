"""Cartesian-impedance manipulation ("robot pushes things").

Reference src/manipulation_sim.cpp:28-93: a PxD6Joint from a world anchor to
the manipulator object with translation free / rotation locked and a spring
drive (stiffness 600 N/m, damping 0.1, force limit 60 N); ``step(goal, dt)``
sets the drive target and steps the scene.

Here the joint is emulated directly: each step applies the clamped spring
force to the manipulator's linear velocity, locks its orientation, and steps
the scene's physics.
"""

from __future__ import annotations

import numpy as np

STIFFNESS = 600.0  # N/m (reference manipulation_sim.cpp:52)
DAMPING = 0.1
FORCE_LIMIT = 60.0  # N


class ManipulationSim:
    def __init__(self, scene, manipulator, initial_pose=None):
        self._scene = scene
        self._obj = manipulator
        if initial_pose is not None:
            manipulator.set_pose(np.asarray(initial_pose, np.float32))
        self._locked_rotation = manipulator.pose()[:3, :3].copy()

    def step(self, goal_pose, dt: float) -> None:
        goal_pose = np.asarray(goal_pose, np.float32).reshape(4, 4)
        pose = self._obj.pose()
        mass = max(self._obj.mass, 1e-6)

        # spring drive toward the goal position
        err = goal_pose[:3, 3] - pose[:3, 3]
        vel = self._obj.linear_velocity
        force = STIFFNESS * err - DAMPING * vel
        norm = float(np.linalg.norm(force))
        if norm > FORCE_LIMIT:
            force *= FORCE_LIMIT / norm
        self._obj.linear_velocity = vel + force / mass * dt

        self._scene.simulate(dt)

        # rotation locked (the D6 joint's angular DOFs are locked)
        locked = self._obj.pose()
        locked[:3, :3] = self._locked_rotation
        self._obj._set_pose_unchecked(locked)
        self._obj.angular_velocity = np.zeros(3, np.float32)
