"""Render saved point clouds to images (the Open3D interactive-viewer
replacement; capability parity with `OLD_SCRIPTS/video3D.py` viewing and
`simple_pointcloud_viewer.py` top-down plots)."""

from __future__ import annotations

import argparse

from ..geom.floorplan_viz import floorplan_visualization
from ..geom.pointcloud import read_ply
from ..geom.render import save_render


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Render a .ply point cloud")
    ap.add_argument("pointcloud")
    ap.add_argument("-o", "--output", required=True, help="output PNG")
    ap.add_argument("--view", default="multi",
                    choices=["front", "top", "side", "iso", "multi", "floorplan"])
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--point_size", type=int, default=2)
    ap.add_argument("--height_threshold", type=float, default=None,
                    help="drop points below this height (any view)")
    ap.add_argument("--fit_shapes", action="store_true")
    ap.add_argument("--dpi", type=int, default=150, help="floorplan view only")
    args = ap.parse_args(argv)

    cloud = read_ply(args.pointcloud)
    if args.view == "floorplan":
        floorplan_visualization(cloud, args.output,
                                height_threshold=args.height_threshold,
                                point_size=args.point_size, dpi=args.dpi,
                                fit_shapes=args.fit_shapes)
    else:
        if args.height_threshold is not None:
            cloud = cloud.select(cloud.points[:, 1] >= args.height_threshold)
        save_render(args.output, cloud, view=args.view,
                    width=args.width, height=args.height,
                    point_size=args.point_size)
    print(f"wrote {args.output}")


if __name__ == "__main__":  # pragma: no cover
    main()
