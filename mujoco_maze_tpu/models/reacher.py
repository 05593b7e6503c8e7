"""2-link "reacher" — a cut-down swimmer.

TPU-native port of the reference ReacherEnv
(`/root/reference/mujoco_maze/reacher.py` + `assets/reacher.xml`): the same
slide-slide-hinge torso and one articulated tail link, one gear-150
actuator, identical fluid options.  The reference README marks Reacher as
untested (README.md:129-130); we keep full behavioral parity with its code.
"""

from __future__ import annotations

from ..physics import engine
from ..physics.model import HINGE, SLIDE, Actuator, Body, Geom, Joint, build_model
from .swimmer import SwimmerRobot, _DEG


def build_reacher_model():
    """Content parity: assets/reacher.xml."""
    torso = Body(
        name="torso",
        parent=-1,
        joints=[
            Joint(SLIDE, axis=(1, 0, 0), armature=0.1, name="slider1"),
            Joint(SLIDE, axis=(0, 1, 0), armature=0.1, name="slider2"),
            Joint(HINGE, axis=(0, 0, 1), armature=0.1, name="rot"),
        ],
        geoms=[Geom.capsule_fromto((1.5, 0, 0), (0.5, 0, 0), 0.1, density=1000.0)],
    )
    mid = Body(
        name="mid",
        parent=0,
        pos=(0.5, 0.0, 0.0),
        joints=[
            Joint(
                HINGE,
                axis=(0, 0, 1),
                armature=0.1,
                limited=True,
                range=(-100 * _DEG, 100 * _DEG),
                name="rot2",
            )
        ],
        geoms=[Geom.capsule_fromto((0, 0, 0), (-1, 0, 0), 0.1, density=1000.0)],
    )
    return build_model(
        [torso, mid],
        [Actuator("rot2", gear=150.0, ctrlrange=(-1, 1))],
        timestep=0.01,
        viscosity=0.1,
        fluid_density=4000.0,
    )


class ReacherRobot(SwimmerRobot):
    NAME = "Reacher"

    nq = 4
    nv = 4
    action_dim = 1
    frame_skip = 4      # reacher.py:29
    obs_dim = 8         # full qpos + qvel (reacher.py:49-53)

    def __init__(self) -> None:
        self.model = engine.prepare(build_reacher_model())
