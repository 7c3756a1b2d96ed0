"""Model and cloud visualization.

Counterpart of the reference's mayavi tooling (utils/visualizer.py:99-445
deformable-kernel inspector, utils/mayavi_visu.py cloud/batch viewers).
Mayavi is not part of this environment, so visualizations are emitted as
artifacts instead of interactive windows: PLY snapshots (inspectable in any
point-cloud viewer) plus matplotlib 3-D PNG previews. If mayavi happens to
be importable, `interactive=True` opens the classic viewer.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Optional, Sequence

import numpy as np

from weasal_tpu.utils.ply import write_ply


def _scatter_png(path: str, points: np.ndarray,
                 colors: Optional[np.ndarray] = None,
                 title: str = "", max_points: int = 40000):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if points.shape[0] > max_points:
        sel = np.random.default_rng(0).choice(points.shape[0], max_points,
                                              replace=False)
        points = points[sel]
        colors = colors[sel] if colors is not None else None
    fig = plt.figure(figsize=(7, 6))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(points[:, 0], points[:, 1], points[:, 2], s=0.5,
               c=colors if colors is not None else points[:, 2],
               cmap="tab10" if colors is not None else "viridis")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def show_point_cloud(points: np.ndarray,
                     labels: Optional[np.ndarray] = None,
                     out_prefix: str = "cloud",
                     interactive: bool = False,
                     html: bool = True):
    """Write <prefix>.ply (+ labels), <prefix>.png preview, and — the
    interactive equivalent of the reference's mayavi window — a standalone
    <prefix>.html WebGL viewer (orbit/zoom/pan, keyboard controls)."""
    fields = [points.astype(np.float32)]
    names = ["x", "y", "z"]
    if labels is not None:
        fields.append(np.asarray(labels, np.int32))
        names.append("class")
    write_ply(out_prefix + ".ply", fields, names)
    _scatter_png(out_prefix + ".png", points, labels, title=out_prefix)
    if html:
        from weasal_tpu.utils.html_viewer import export_html
        export_html(out_prefix + ".html",
                    layers=[(os.path.basename(out_prefix), points,
                             labels, 1.5)],
                    title=os.path.basename(out_prefix))
    if interactive:                                 # pragma: no cover
        try:
            from mayavi import mlab
            mlab.points3d(points[:, 0], points[:, 1], points[:, 2],
                          labels if labels is not None else points[:, 2],
                          mode="point")
            mlab.show()
        except ImportError:
            print("mayavi not available; artifacts written instead")
    return out_prefix + ".ply"


def show_batch(batch, out_dir: str = "debug_batch", sphere: int = 0):
    """Dump every pyramid level of one sphere as ply + png, plus one
    interactive HTML where arrow keys step through the levels (the
    reference's mayavi batch viewer behavior, utils/mayavi_visu.py)."""
    os.makedirs(out_dir, exist_ok=True)
    outputs = []
    frames = []
    for l in range(batch.num_layers):
        pts = np.asarray(batch.points[l][sphere])
        mask = np.asarray(batch.masks[l][sphere])
        prefix = join(out_dir, f"sphere{sphere}_level{l}")
        outputs.append(show_point_cloud(pts[mask], out_prefix=prefix,
                                        html=False))
        frames.append((f"level {l}", pts[mask], None, 1.5))
    from weasal_tpu.utils.html_viewer import export_html
    outputs.append(export_html(join(out_dir, f"sphere{sphere}_levels.html"),
                               frames=frames,
                               title=f"sphere {sphere} pyramid levels"))
    return outputs


class ModelVisualizer:
    """Deformable-kernel inspector (reference utils/visualizer.py:99-445).

    Runs the network forward with the 'deform' collection mutable, then
    writes, for chosen query points, the deformed kernel positions together
    with the local neighborhood as PLY frames.
    """

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables

    def show_deformable_kernels(self, batch, out_dir: str = "deform_vis",
                                sphere: int = 0,
                                query_indices: Sequence[int] = (0, 1, 2)):
        os.makedirs(out_dir, exist_ok=True)
        out, mutated = self.model.apply(
            self.variables, batch, train=False, mutable=["deform"])
        deform = mutated.get("deform", {})
        if not deform:
            print("Network has no deformable KPConv blocks; nothing to show")
            return []

        import jax

        from weasal_tpu.data.batching import layer_radii

        config = self.model.config
        conv_r, _, _ = layer_radii(config)
        # extent-normalized -> world: kp was sown as (points+offsets)/
        # kp_extent in the QUERY-LOCAL frame (models/blocks.py); undo the
        # normalization and translate to the query position so the frames
        # overlay the context cloud.
        extents = [r * config.KP_extent / config.conv_radius
                   for r in conv_r]

        frames = []
        leaves = jax.tree_util.tree_leaves_with_path(deform)
        kp_leaves = [(p, l) for p, l in leaves
                     if any("deformed_kp" in str(k) for k in p)]
        points0 = np.asarray(batch.points[0][sphere])
        mask0 = np.asarray(batch.masks[0][sphere])
        level_sizes = [np.asarray(p).shape[1] for p in batch.points]
        from weasal_tpu.utils.html_viewer import export_html

        for li, (path, leaf) in enumerate(kp_leaves):
            kp = np.asarray(leaf)[sphere]        # [Nq, Kp, 3] normalized
            level = (level_sizes.index(kp.shape[0])
                     if kp.shape[0] in level_sizes else 0)
            q_pts = np.asarray(batch.points[level][sphere])
            ext = extents[min(level, len(extents) - 1)]
            html_frames = []
            for qi in query_indices:
                if qi >= kp.shape[0]:
                    continue
                prefix = join(out_dir, f"block{li}_query{qi}")
                world = kp[qi] * ext + q_pts[qi][None, :]
                write_ply(prefix + "_kernels.ply",
                          world.astype(np.float32), ["x", "y", "z"])
                frames.append(prefix + "_kernels.ply")
                # one frame per picked query — g/h steps between queries,
                # the interactive analogue of the reference's point picker
                # (utils/visualizer.py:206-229)
                rgb = np.tile(np.array([[214, 39, 40]], np.uint8),
                              (world.shape[0], 1))
                html_frames.append((f"query {qi} deformed kernel",
                                    world.astype(np.float32), rgb, 8.0))
            if html_frames:
                grey = np.tile(np.array([[150, 150, 150]], np.uint8),
                               (int(mask0.sum()), 1))
                export_html(join(out_dir, f"block{li}_kernels.html"),
                            layers=[("input cloud", points0[mask0],
                                     grey, 1.2)],
                            frames=html_frames,
                            title=f"deformable kernels, block {li}")
                frames.append(join(out_dir, f"block{li}_kernels.html"))
        # Context cloud for reference
        show_point_cloud(points0[mask0], out_prefix=join(out_dir, "input"))
        return frames
