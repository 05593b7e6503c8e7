"""Software top-down rasterizer: maze + robot + objects → RGB frame.

The TPU build's replacement for the reference's OpenGL offscreen render
(`/root/reference/mujoco_maze/maze_env.py:389-393`): a dependency-free numpy
rasterizer good enough for the websocket viewer and debugging.  Renders env 0
of a batch or a single env state.
"""

from __future__ import annotations

import numpy as np

from ..maze.cells import MazeCell

WALL = np.array([102, 102, 102], dtype=np.uint8)
CHASM = np.array([30, 30, 40], dtype=np.uint8)
FLOOR = np.array([220, 228, 220], dtype=np.uint8)
ROBOT = np.array([204, 102, 26], dtype=np.uint8)
BLOCK = np.array([230, 26, 26], dtype=np.uint8)
BALL = np.array([26, 26, 180], dtype=np.uint8)


def render_top_view(spec, state, px_per_cell: int = 32) -> np.ndarray:
    """Rasterize one env state to an (H, W, 3) uint8 image."""
    ms = spec.structure
    grid = ms.grid
    h_cells, w_cells = grid.shape
    s = ms.size_scaling
    H, W = h_cells * px_per_cell, w_cells * px_per_cell
    img = np.empty((H, W, 3), dtype=np.uint8)

    for i in range(h_cells):
        for j in range(w_cells):
            cell = MazeCell(int(grid[i, j]))
            color = WALL if cell.is_block() else CHASM if cell.is_chasm() else FLOOR
            img[
                i * px_per_cell : (i + 1) * px_per_cell,
                j * px_per_cell : (j + 1) * px_per_cell,
            ] = color

    def world_to_px(x: float, y: float):
        col = (x + ms.torso_x) / s + 0.5
        row = (y + ms.torso_y) / s + 0.5
        return row * px_per_cell, col * px_per_cell

    def disc(x, y, radius_world, color):
        r, c = world_to_px(x, y)
        rad = max(2, int(radius_world / s * px_per_cell))
        rr, cc = np.ogrid[:H, :W]
        mask = (rr - r) ** 2 + (cc - c) ** 2 <= rad**2
        img[mask] = color

    qpos = np.asarray(state.qpos)
    # goals
    for goal in spec.task.goals:
        size = goal.custom_size if goal.custom_size is not None else s * 0.1
        rgb = np.array(
            [goal.rgb.red * 255, goal.rgb.green * 255, goal.rgb.blue * 255],
            dtype=np.uint8,
        )
        disc(goal.pos[0], goal.pos[1], size, rgb)
    # movable blocks
    for b in spec.block_runtimes:
        c = np.array(b.body_pos, dtype=np.float64)
        for k in range(2):
            idx = b.qpos_idx[k]
            if idx >= 0:
                c[k] += qpos[idx]
        r0, c0 = world_to_px(c[0], c[1])
        half = float(b.half[0]) / s * px_per_cell
        img[
            max(0, int(r0 - half)) : min(H, int(r0 + half)),
            max(0, int(c0 - half)) : min(W, int(c0 + half)),
        ] = BLOCK
    # object balls
    for ob in spec.ball_runtimes:
        if getattr(ob, "kind", "hinge") == "free":
            adr = ob.qpos_idx[0]
            c = qpos[adr : adr + 2]
        else:
            c = np.array(ob.body_pos, dtype=np.float64)
            c[0] += qpos[ob.qpos_idx[0]]
            c[1] += qpos[ob.qpos_idx[1]]
        disc(c[0], c[1], ob.size, BALL)
    # robot
    radius = spec.robot.RADIUS if spec.robot.RADIUS is not None else 0.5
    disc(qpos[0], qpos[1], radius, ROBOT)
    return img
