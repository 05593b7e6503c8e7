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


def render_camera_view(
    spec,
    state,
    image_shape=None,
    camera_move_x=None,
    camera_move_y=None,
    camera_zoom=None,
    px_per_cell: int = 32,
) -> np.ndarray:
    """Top-down render with the reference's camera kwargs applied.

    The reference moves an OpenGL camera (`maze_env.py:395-403`:
    ``camera_move_x/y`` rotate/pan the view, ``camera_zoom`` dollies in,
    ``image_shape`` sets the offscreen buffer size).  The software
    rasterizer maps them to the 2-D analog: pan the view window by
    (move_x, move_y) world units, scale it by ``1/(1+zoom)``, and resample
    to ``image_shape`` (width, height).
    """
    base = render_top_view(spec, state, px_per_cell=px_per_cell)
    H, W = base.shape[:2]
    s = spec.structure.size_scaling
    zoom = 1.0 + (camera_zoom if camera_zoom is not None else 0.0)
    zoom = max(zoom, 1e-3)
    # pan in world units → pixels (x = columns, y = rows)
    dx_px = (camera_move_x / s * px_per_cell) if camera_move_x else 0.0
    dy_px = (camera_move_y / s * px_per_cell) if camera_move_y else 0.0
    cr = H / 2.0 + dy_px
    cc = W / 2.0 + dx_px
    half_h = H / (2.0 * zoom)
    half_w = W / (2.0 * zoom)
    out_w, out_h = image_shape if image_shape is not None else (W, H)
    rows = np.clip(
        np.linspace(cr - half_h, cr + half_h, out_h).astype(np.int64), 0, H - 1
    )
    cols = np.clip(
        np.linspace(cc - half_w, cc + half_w, out_w).astype(np.int64), 0, W - 1
    )
    return base[np.ix_(rows, cols)]
