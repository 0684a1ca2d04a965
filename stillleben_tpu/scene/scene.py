"""The Scene: camera, lights, background, objects, physics.

API parity with the reference ``sl::Scene`` (src/scene.cpp,
python/src/py_scene.cpp): camera with 58 deg default horizontal FOV and
CV-convention projection, 3 directional lights (first defaults to radiance
300), white background color, background plane, tabletop simulation with the
reference's exact 100x4-substep schedule + redrop recovery, pose samplers,
text serialization.

TPU-first underneath: the physics state is compiled to padded pytrees once
per object-set change; `simulate*` run as single XLA programs and write
poses back to the host Objects.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..physics import tabletop as tt
from ..physics.bodies import transform_hull
from ..physics.contacts import Floor, hull_pairs_host, make_floor
from ..physics.engine import check_overlaps, simulate_steps, step as physics_step
from ..physics.types import (
    BodyParams,
    BodyState,
    HullAtlas,
    SolverConfig,
    build_hull_atlas,
    default_config,
)
from ..render import camera as cam
from . import pose as pose_samplers

# compiled ONCE per shape set (jit keys on function identity + avals); the
# viewer/telemetry per-iteration settle loop replays this executable
_settle_step = jax.jit(
    tt.settle, static_argnames=("cfg", "iterations", "substeps")
)
from .camera_fit import choose_random_camera_pose, choose_random_light_direction
from .object import Object

NUM_LIGHTS = 3  # reference include/stillleben/common.h:17


class Scene:
    def __init__(self, viewport: tuple[int, int] = (640, 480)):
        """viewport is (W, H) like the reference python binding."""
        self._viewport = (int(viewport[0]), int(viewport[1]))
        self._camera_pose = np.eye(4, dtype=np.float32)
        self._projection = np.asarray(
            cam.projection_from_fov(
                np.deg2rad(cam.DEFAULT_HFOV_DEG), self._viewport[0], self._viewport[1]
            )
        )
        self._objects: list[Object] = []

        self._light_directions = np.zeros((NUM_LIGHTS, 3), np.float32)
        self._light_colors = np.zeros((NUM_LIGHTS, 3), np.float32)
        self._light_colors[0] = 300.0  # radiance units (scene.h:226-230)
        self._ambient_light = np.zeros(3, np.float32)
        self._light_map = None

        self._background_color = np.array([1.0, 1.0, 1.0, 1.0], np.float32)
        self._background_image = None
        self._background_plane_pose = np.eye(4, dtype=np.float32)
        self._background_plane_size = np.zeros(2, np.float32)
        self._background_plane_texture = None

        self._manual_exposure = -1.0

        self._rng = np.random.default_rng()
        self._key = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))

        self._gravity = (0.0, 0.0, -9.81)
        self._solver_cfg = default_config(self._gravity)
        self._compiled = None  # (atlas, params, pairs, geom) cache
        self._compiled_stamp = None

    # -- misc -----------------------------------------------------------------

    def seed(self, seed: int) -> None:
        """Deterministic randomness for tests/datagen."""
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    @property
    def viewport(self) -> tuple[int, int]:
        return self._viewport

    # -- camera -----------------------------------------------------------------

    def camera_pose(self) -> np.ndarray:
        return self._camera_pose.copy()

    def set_camera_pose(self, pose) -> None:
        pose = np.asarray(pose, np.float32).reshape(4, 4)
        R = pose[:3, :3]
        if abs(np.linalg.det(R) - 1.0) > 1e-3 or np.abs(R @ R.T - np.eye(3)).max() > 1e-3:
            raise ValueError(f"Camera pose is not rigid:\n{pose}")
        self._camera_pose = pose

    def set_camera_look_at(self, position, look_at, up=(0.0, 0.0, 1.0)) -> None:
        """+Z-forward camera look-at (reference src/scene.cpp:205-215)."""
        T = np.asarray(
            m.look_at(
                jnp.asarray(position, jnp.float32),
                jnp.asarray(look_at, jnp.float32),
                jnp.asarray(up, jnp.float32),
            )
        )
        self._camera_pose = T

    def set_camera_intrinsics(self, fx, fy, cx, cy) -> None:
        W, H = self._viewport
        self._projection = np.asarray(cam.projection_from_intrinsics(fx, fy, cx, cy, W, H))

    def set_camera_hfov(self, hfov: float) -> None:
        W, H = self._viewport
        self._projection = np.asarray(cam.projection_from_fov(hfov, W, H))

    def set_camera_projection(self, P) -> None:
        self._projection = np.asarray(P, np.float32).reshape(4, 4)

    def projection_matrix(self) -> np.ndarray:
        return self._projection.copy()

    def camera_to_world(self, pose_in_camera) -> np.ndarray:
        return (self._camera_pose @ np.asarray(pose_in_camera, np.float32)).astype(
            np.float32
        )

    def min_dist_for_object_diameter(self, diameter: float) -> float:
        return float(cam.minimum_distance_for_object_diameter(diameter, self._projection))

    def place_object_randomly(
        self, diameter: float, min_size_factor: float = pose_samplers.DEFAULT_MIN_SIZE_FACTOR
    ) -> np.ndarray:
        ps = pose_samplers.RandomPositionSampler(self._projection, diameter)
        ps.min_size_factor = min_size_factor
        return pose_samplers.RandomPoseSampler(ps)(self._rng)

    # -- lights -------------------------------------------------------------------

    @property
    def light_directions(self) -> np.ndarray:
        """(NumLights, 3). In-place views in the reference; mutate via setter."""
        return self._light_directions

    @light_directions.setter
    def light_directions(self, dirs) -> None:
        dirs = np.asarray(dirs, np.float32).reshape(-1, 3)
        if dirs.shape[0] > NUM_LIGHTS:
            raise ValueError("Cannot support that many lights")
        self._light_directions[:] = 0
        self._light_directions[: dirs.shape[0]] = dirs

    @property
    def light_colors(self) -> np.ndarray:
        return self._light_colors

    @light_colors.setter
    def light_colors(self, colors) -> None:
        colors = np.asarray(colors, np.float32).reshape(-1, 3)
        if colors.shape[0] > NUM_LIGHTS:
            raise ValueError("Cannot support that many lights")
        self._light_colors[:] = 0
        self._light_colors[: colors.shape[0]] = colors

    @property
    def ambient_light(self) -> np.ndarray:
        return self._ambient_light.copy()

    @ambient_light.setter
    def ambient_light(self, c) -> None:
        self._ambient_light = np.asarray(c, np.float32).reshape(3)

    @property
    def light_map(self):
        return self._light_map

    @light_map.setter
    def light_map(self, lm) -> None:
        self._light_map = lm

    def choose_random_light_direction(self) -> None:
        """(reference src/scene.cpp:453-470)"""
        d = choose_random_light_direction(
            self._next_key(), jnp.asarray(self._camera_pose)
        )
        self.light_directions = np.asarray(d)[None]

    # deprecated alias used by the reference's examples/ycb.py
    choose_random_light_position = choose_random_light_direction

    @property
    def manual_exposure(self) -> float:
        return self._manual_exposure

    @manual_exposure.setter
    def manual_exposure(self, v: float) -> None:
        self._manual_exposure = float(v)

    # -- background ------------------------------------------------------------------

    @property
    def background_color(self) -> np.ndarray:
        return self._background_color.copy()

    @background_color.setter
    def background_color(self, c) -> None:
        self._background_color = np.asarray(c, np.float32).reshape(4)

    @property
    def background_image(self):
        return self._background_image

    @background_image.setter
    def background_image(self, tex) -> None:
        self._background_image = tex

    @property
    def background_plane_pose(self) -> np.ndarray:
        return self._background_plane_pose.copy()

    @background_plane_pose.setter
    def background_plane_pose(self, pose) -> None:
        self._background_plane_pose = np.asarray(pose, np.float32).reshape(4, 4)

    @property
    def background_plane_size(self) -> np.ndarray:
        return self._background_plane_size.copy()

    @background_plane_size.setter
    def background_plane_size(self, size) -> None:
        self._background_plane_size = np.asarray(size, np.float32).reshape(2)

    @property
    def background_plane_texture(self):
        return self._background_plane_texture

    @background_plane_texture.setter
    def background_plane_texture(self, tex) -> None:
        self._background_plane_texture = tex

    # -- objects ------------------------------------------------------------------------

    def add_object(self, obj: Object) -> None:
        """(reference src/scene.cpp:279-289: auto instance index)"""
        self._objects.append(obj)
        if obj.instance_index == 0:
            obj.instance_index = len(self._objects)
        self._invalidate()

    def remove_object(self, obj: Object) -> None:
        if obj in self._objects:
            self._objects.remove(obj)
            self._invalidate()

    @property
    def objects(self) -> list[Object]:
        return list(self._objects)

    def clear_objects(self) -> None:
        self._objects.clear()
        self._invalidate()

    def load_visual(self) -> None:
        for o in self._objects:
            o.mesh.load_visual()

    def load_physics(self) -> None:
        for o in self._objects:
            o.mesh.load_physics()

    # -- physics compilation -----------------------------------------------------------

    def _invalidate(self) -> None:
        self._compiled = None
        self._compiled_stamp = None

    def _stamp(self) -> tuple:
        return tuple(
            (id(o), o.mesh._dirty, o.static, o.density, o._mass_override,
             o.static_friction, o.dynamic_friction, o.restitution,
             o.linear_velocity_limit, o.lock_rotation)
            for o in self._objects
        )

    def _compile(self):
        """Build padded pytrees for the current object set (cached)."""
        stamp = self._stamp()
        if self._compiled is not None and self._compiled_stamp == stamp:
            return self._compiled
        self.load_physics()
        nb = max(len(self._objects), 1)

        hull_lists = []
        inv_mass = np.zeros(nb, np.float32)
        inv_inertia = np.tile(np.eye(3, dtype=np.float32), (nb, 1, 1))
        com = np.zeros((nb, 3), np.float32)
        friction = np.full(nb, 0.5, np.float32)
        friction_static = np.full(nb, 0.5, np.float32)
        restitution = np.zeros(nb, np.float32)
        vel_limit = np.full(nb, np.float32(3.4e38), np.float32)
        valid = np.zeros(nb, bool)
        kinematic = np.zeros(nb, bool)
        diameter = np.zeros(nb, np.float32)
        bbox_center = np.zeros((nb, 3), np.float32)
        dynamic = np.zeros(nb, bool)

        for i, o in enumerate(self._objects):
            P = o.mesh.pretransform
            hulls = [transform_hull(h, P) for h in o.mesh._physics.hulls]
            hull_lists.append(hulls)
            mass, c, inertia = o.mass_properties()
            if o.static or mass <= 0:
                inv_mass[i] = 0.0
            else:
                inv_mass[i] = 1.0 / mass
                inv_inertia[i] = np.linalg.inv(
                    inertia + 1e-12 * np.eye(3)
                ).astype(np.float32)
            if o.lock_rotation:
                # solver-level D6 rotation lock (see Object.lock_rotation)
                inv_inertia[i] = 0.0
            com[i] = c
            # per-body material; contacts combine by PhysX's default
            # AVERAGE rule, stick/slip selects static vs dynamic (solver)
            friction[i] = o.dynamic_friction
            friction_static[i] = o.static_friction
            restitution[i] = o.restitution
            vel_limit[i] = min(o.linear_velocity_limit, 3.4e38)
            valid[i] = True
            kinematic[i] = o.static
            bbox = o.mesh.bbox
            diameter[i] = bbox.diagonal
            bbox_center[i] = bbox.center
            dynamic[i] = not o.static

        if not self._objects:
            hull_lists.append([])

        atlas = build_hull_atlas(hull_lists)
        params = BodyParams(
            inv_mass=jnp.asarray(inv_mass),
            inv_inertia_body=jnp.asarray(inv_inertia),
            com=jnp.asarray(com),
            friction=jnp.asarray(friction),
            friction_static=jnp.asarray(friction_static),
            restitution=jnp.asarray(restitution),
            linear_velocity_limit=jnp.asarray(vel_limit),
            valid=jnp.asarray(valid),
            kinematic=jnp.asarray(kinematic),
        )
        pairs = jnp.asarray(hull_pairs_host(atlas))
        geom = tt.TabletopGeom(
            diameter=jnp.asarray(diameter),
            bbox_center=jnp.asarray(bbox_center),
            dynamic=jnp.asarray(dynamic),
        )
        self._compiled = (atlas, params, pairs, geom)
        self._compiled_stamp = stamp
        return self._compiled

    def _state_from_objects(self) -> BodyState:
        nb = max(len(self._objects), 1)
        pos = np.zeros((nb, 3), np.float32)
        quat = np.tile(np.array([1.0, 0, 0, 0], np.float32), (nb, 1))
        lin = np.zeros((nb, 3), np.float32)
        ang = np.zeros((nb, 3), np.float32)
        for i, o in enumerate(self._objects):
            T = o.pose()
            pos[i] = T[:3, 3]
            quat[i] = np.asarray(m.matrix_to_quat(T[:3, :3]))
            lin[i] = o.linear_velocity
            ang[i] = o.angular_velocity
        return BodyState(
            pos=jnp.asarray(pos), quat=jnp.asarray(quat),
            lin_vel=jnp.asarray(lin), ang_vel=jnp.asarray(ang),
        )

    def _write_back(self, state: BodyState, report=None) -> None:
        pos = np.asarray(state.pos)
        quat = np.asarray(state.quat)
        lin = np.asarray(state.lin_vel)
        ang = np.asarray(state.ang_vel)
        seps = np.asarray(report.min_separation) if report is not None else None
        for i, o in enumerate(self._objects):
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = np.asarray(m.quat_to_matrix(quat[i]))
            T[:3, 3] = pos[i]
            o._set_pose_unchecked(T)
            o._linear_velocity = lin[i]
            o._angular_velocity = ang[i]
            if seps is not None:
                o.separation = float(seps[i])

    def _default_floor(self, enabled: bool) -> Floor:
        return make_floor(
            height=tt.FLOOR_TOP_Z, enabled=enabled, friction=0.5, restitution=0.0
        )

    # -- simulation -------------------------------------------------------------------

    @property
    def gravity(self):
        return np.asarray(self._gravity, np.float32)

    @gravity.setter
    def gravity(self, g) -> None:
        self._gravity = tuple(float(x) for x in np.asarray(g).reshape(3))
        self._solver_cfg = default_config(self._gravity)

    def simulate(self, dt: float) -> None:
        """One physics step + pose writeback (reference src/scene.cpp:903-912).
        NOTE: no implicit floor — only scene objects collide."""
        atlas, params, pairs, _ = self._compile()
        state = self._state_from_objects()
        floor = self._default_floor(enabled=False)
        state, report = physics_step(
            atlas, params, state, floor, pairs, float(dt), self._solver_cfg
        )
        self._write_back(state, report)

    def simulate_tabletop_scene(self, vis_cb=None) -> None:
        """(reference src/scene.cpp:612-759)"""
        atlas, params, pairs, geom = self._compile()
        all_dynamic = all(not o.static for o in self._objects)
        floor = self._default_floor(enabled=all_dynamic)
        base_z = tt.FLOOR_TOP_Z if all_dynamic else tt.STACK_BASE_STATIC

        if all_dynamic:
            # randomize the visual plane's yaw so the visual matches physics
            # (reference src/scene.cpp:655-663)
            yaw = self._rng.uniform(-np.pi, np.pi)
            Rz = np.eye(4, dtype=np.float32)
            Rz[:3, :3] = np.asarray(m.rotation_z(np.float32(yaw)))
            offset = np.eye(4, dtype=np.float32)
            offset[2, 3] = tt.FLOOR_TOP_Z
            self.background_plane_pose = Rz @ offset

        if vis_cb is None:
            state = tt.simulate_tabletop(
                self._next_key(), atlas, params, floor, pairs, geom,
                self._solver_cfg, jnp.float32(base_z),
            )
        else:
            # per-iteration callback path (used by the viewer): one frame at
            # a time, writeback each iteration. The step MUST go through the
            # module-level jit: a bare tt.settle call re-traces lax.scan
            # every iteration and the executable cache keys on jaxpr
            # IDENTITY, so 100 iterations meant 100 full XLA compiles —
            # leaked JIT code pages until LLVM aborted the process.
            state = tt.stack_objects(self._next_key(), geom, jnp.float32(base_z))
            for i in range(tt.MAX_ITERATIONS):
                vis_cb(i)
                state = _settle_step(
                    atlas, params, state, floor, pairs, geom, self._solver_cfg,
                    iterations=1,
                )
                self._write_back(state)
        from ..utils import sanitize

        if sanitize.enabled():  # SL_SANITIZE=1: settle output NaN/Inf audit
            sanitize.check_finite(state, "simulate_tabletop_scene state")
        self._write_back(state)
        self.choose_random_camera_pose()

    def choose_random_camera_pose(self) -> None:
        corners = []
        for o in self._objects:
            c = o.mesh.bbox.corners()  # (8,3) mesh frame (pretransformed)
            T = o.pose()
            corners.append(c @ T[:3, :3].T + T[:3, 3])
        if corners:
            pts = np.concatenate(corners, axis=0).astype(np.float32)
            valid = np.ones(len(pts), bool)
        else:
            pts = np.zeros((1, 3), np.float32)
            valid = np.zeros(1, bool)
        pose = choose_random_camera_pose(
            self._next_key(),
            jnp.asarray(self._projection),
            jnp.asarray(pts),
            jnp.asarray(valid),
        )
        self._camera_pose = np.asarray(pose)

    def check_collisions(self) -> list[bool]:
        """(reference src/scene.cpp:914-925)"""
        atlas, params, pairs, _ = self._compile()
        state = self._state_from_objects()
        hits = check_overlaps(atlas, params, state, pairs)
        return [bool(h) for h in np.asarray(hits)[: len(self._objects)]]

    def is_object_colliding(self, obj: Object) -> bool:
        idx = self._objects.index(obj)
        return self.check_collisions()[idx]

    def find_noncolliding_pose(
        self, obj: Object, sampler: str = "random", max_iterations: int = 10, **kwargs
    ) -> bool:
        """(reference py_scene.cpp:193-259 + scene.h:245-261)"""
        diameter = obj.mesh.bbox.diagonal
        ps = pose_samplers.RandomPositionSampler(self._projection, diameter)
        if "min_size_factor" in kwargs:
            ps.min_size_factor = float(kwargs["min_size_factor"])
        if sampler == "random":
            s = pose_samplers.RandomPoseSampler(ps)
        elif sampler == "viewpoint":
            if "viewpoint" not in kwargs:
                raise ValueError("sampler='viewpoint' needs viewpoint argument")
            s = pose_samplers.ViewPointPoseSampler(ps)
            s.view_point = np.asarray(kwargs["viewpoint"], np.float32).reshape(3)
        elif sampler == "view_corrected":
            if "orientation" not in kwargs:
                raise ValueError("sampler='view_corrected' needs orientation argument")
            s = pose_samplers.ViewCorrectedPoseSampler(
                ps, np.asarray(kwargs["orientation"], np.float32)
            )
        else:
            raise ValueError(f"Unknown sampler {sampler!r}")

        for _ in range(max_iterations):
            obj.set_pose(s(self._rng))
            if not self.is_object_colliding(obj):
                return True
        return False

    # -- serialization ------------------------------------------------------------------

    def serialize(self, format: str = "corrade") -> str:
        """Text serialization in the reference's Corrade Configuration format
        (src/scene.cpp:761-799; format doc at include/stillleben/scene.h:41-67)
        so scene files round-trip between implementations. ``format="json"``
        keeps the round-1 JSON schema as an alternate."""
        if format == "json":
            return self._serialize_json()
        from ..utils.corrade_config import (
            ConfigurationGroup,
            fmt_quaternion_wxyz,
            save,
        )

        root = ConfigurationGroup()
        root.set_value("viewport", np.asarray(self._viewport, np.int32))
        root.set_value("projection", self._projection)
        root.set_value("cameraPosition", self._camera_pose[:3, 3])
        q = np.asarray(m.matrix_to_quat(jnp.asarray(self._camera_pose[:3, :3])))
        root.set_value("cameraRotation", fmt_quaternion_wxyz(q))
        for i in range(len(self._light_directions)):
            lg = root.add_group("light")
            lg.set_value("direction", self._light_directions[i])
            lg.set_value("color", self._light_colors[i])
        root.set_value("ambientLight", self._ambient_light)
        root.set_value("numObjects", len(self._objects))
        for o in self._objects:
            og = root.add_group("object")
            o.serialize_config(og)
        if self._light_map is not None and getattr(self._light_map, "path", None):
            root.set_value("lightMap", self._light_map.path)
        root.set_value("backgroundPlanePose", self._background_plane_pose)
        root.set_value("backgroundPlaneSize", self._background_plane_size)
        root.set_value("manualExposure", float(self._manual_exposure))
        return save(root)

    def _serialize_json(self) -> str:
        d = {
            "viewport": list(self._viewport),
            "projection": self._projection.reshape(-1).tolist(),
            "cameraPose": self._camera_pose.reshape(-1).tolist(),
            "lightDirections": self._light_directions.tolist(),
            "lightColors": self._light_colors.tolist(),
            "ambientLight": self._ambient_light.tolist(),
            "backgroundColor": self._background_color.tolist(),
            "backgroundPlanePose": self._background_plane_pose.reshape(-1).tolist(),
            "backgroundPlaneSize": self._background_plane_size.tolist(),
            "manualExposure": self._manual_exposure,
            "objects": [o.serialize() for o in self._objects],
        }
        if self._light_map is not None and getattr(self._light_map, "path", None):
            d["lightMap"] = self._light_map.path
        return json.dumps(d, indent=1)

    def deserialize(self, text: str, cache=None) -> None:
        """Load a serialized scene. Detects the format: Corrade Configuration
        text (the reference's native schema, src/scene.cpp:801-869) or this
        package's round-1 JSON."""
        if text.lstrip().startswith("{"):
            return self._deserialize_json(text, cache)
        from ..utils.corrade_config import parse, parse_floats, parse_matrix, \
            parse_quaternion_wxyz

        g = parse(text)
        if g.has_value("viewport"):
            self._viewport = tuple(
                int(float(x)) for x in g.value("viewport").split()
            )
        if g.has_value("projection"):
            self._projection = parse_matrix(g.value("projection"))
        if g.has_value("cameraPosition") and g.has_value("cameraRotation"):
            pose = np.eye(4, dtype=np.float32)
            quat = parse_quaternion_wxyz(g.value("cameraRotation"))
            pose[:3, :3] = np.asarray(m.quat_to_matrix(jnp.asarray(quat)))
            pose[:3, 3] = parse_floats(g.value("cameraPosition"), 3)
            self._camera_pose = pose
        elif g.has_value("cameraPose"):
            self._camera_pose = parse_matrix(g.value("cameraPose"))
        if g.has_value("lightPosition"):
            # legacy single-light scenes (reference src/scene.cpp:816-820)
            p = parse_floats(g.value("lightPosition"), 3)
            n = p / max(float(np.linalg.norm(p)), 1e-12)
            self._light_directions = (-n).reshape(1, 3).astype(np.float32)
            self._light_colors = np.array([[0.0, 0.8, 0.0]], np.float32)
        else:
            lights = g.groups("light")
            if lights:
                self._light_directions = np.stack(
                    [parse_floats(lg.value("direction"), 3) for lg in lights]
                )
                self._light_colors = np.stack(
                    [parse_floats(lg.value("color"), 3) for lg in lights]
                )
        if g.has_value("ambientLight"):
            self._ambient_light = parse_floats(g.value("ambientLight"), 3)
        if g.has_value("lightMap"):
            from ..render.light_map import LightMap

            self._light_map = LightMap(g.value("lightMap"))
        if g.has_value("backgroundPlanePose"):
            self._background_plane_pose = parse_matrix(g.value("backgroundPlanePose"))
        if g.has_value("backgroundPlaneSize"):
            self._background_plane_size = parse_floats(
                g.value("backgroundPlaneSize"), 2
            )
        if g.has_value("manualExposure"):
            self._manual_exposure = float(g.value("manualExposure"))
        if cache is None:
            from ..assets.mesh import MeshCache

            cache = MeshCache()
        self._objects = [
            Object.deserialize_config(og, cache) for og in g.groups("object")
        ]
        self._invalidate()
        return None

    def _deserialize_json(self, text: str, cache=None) -> None:
        d = json.loads(text)
        if "viewport" in d:
            self._viewport = tuple(int(x) for x in d["viewport"])
        if "projection" in d:
            self._projection = np.array(d["projection"], np.float32).reshape(4, 4)
        if "cameraPose" in d:
            self._camera_pose = np.array(d["cameraPose"], np.float32).reshape(4, 4)
        if "lightDirections" in d:
            self._light_directions = np.array(d["lightDirections"], np.float32)
        if "lightColors" in d:
            self._light_colors = np.array(d["lightColors"], np.float32)
        if "ambientLight" in d:
            self._ambient_light = np.array(d["ambientLight"], np.float32)
        if "backgroundColor" in d:
            self._background_color = np.array(d["backgroundColor"], np.float32)
        if "backgroundPlanePose" in d:
            self._background_plane_pose = np.array(
                d["backgroundPlanePose"], np.float32
            ).reshape(4, 4)
        if "backgroundPlaneSize" in d:
            self._background_plane_size = np.array(d["backgroundPlaneSize"], np.float32)
        if "manualExposure" in d:
            self._manual_exposure = float(d["manualExposure"])
        if "lightMap" in d:
            from ..render.light_map import LightMap

            self._light_map = LightMap(d["lightMap"])
        self._objects = [Object.deserialize(og, cache) for og in d.get("objects", [])]
        self._invalidate()

    # deprecated alias (reference py_scene.cpp light_position)
    @property
    def light_position(self) -> np.ndarray:
        return -self._light_directions[0]

    @light_position.setter
    def light_position(self, p) -> None:
        self.light_directions = -np.asarray(p, np.float32).reshape(1, 3)
