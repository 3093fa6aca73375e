#!/usr/bin/env python
"""URDF/chain smoke: print joint origins (ref scripts/python_test.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hrpe_tpu.kinematics import load_robot

robot = load_robot(sys.argv[1] if len(sys.argv) > 1 else "panda")
print(f"{robot.name}: dof={robot.dof} links={len(robot.link_names)}")
for j in robot.joints:
    print(f"  {j.name}: {j.parent_link} -> {j.child_link} origin_t={j.origin[:3,3]}")
