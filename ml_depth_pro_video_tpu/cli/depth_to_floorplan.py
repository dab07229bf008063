"""Image -> depth-space shadow removal -> floor plan (one shot).

Capability parity with the legacy front-end
`/root/reference/OLD_SCRIPTS/create_floor_plan.py:16-123`
(``remove_depth_shadows`` + ``create_floor_plan``), composed from the
current stack: depth -> shadow interpolation -> unprojection ->
normalization -> direct floor plan.
"""

from __future__ import annotations

import argparse
import os

from ..geom.depth_shadows import remove_depth_shadows
from ..geom.floorplan import create_direct_floorplan
from ..geom.ground import fit_ground_plane, normalize_to_ground
from ..geom.unproject import depth_to_3d


def depth_image_to_floorplan(
    image_path: str,
    output_dir: str | None = None,
    height_threshold: float | None = 1.3,
    threshold_factor: float = 0.2,
    force_horizontal: bool = False,
    grid_resolution: float = 0.05,
    runner=None,
    seed: int = 0,
) -> str:
    from ..video.runner import DepthVideoRunner

    runner = runner or DepthVideoRunner(precision="bf16")
    result = runner.infer_one(image_path)

    depth, mask, ground = remove_depth_shadows(
        result["depth"], image=result["image"], f_px=result["focallength_px"],
        threshold_factor=threshold_factor, force_horizontal=force_horizontal,
        seed=seed,
    )
    points, _ = depth_to_3d(depth, result["focallength_px"])
    if ground is None:
        ground = fit_ground_plane(points, seed=seed)
    points = normalize_to_ground(points, ground)

    output_dir = output_dir or os.path.dirname(os.path.abspath(image_path))
    os.makedirs(output_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(image_path))[0]
    out = os.path.join(output_dir, f"{stem}_floorplan.png")
    create_direct_floorplan(points, out, height_threshold=height_threshold,
                            grid_resolution=grid_resolution)
    return out


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Image -> floor plan (depth-space cleanup)")
    ap.add_argument("--image_path", required=True)
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--height_threshold", type=float, default=1.3)
    ap.add_argument("--threshold_factor", type=float, default=0.2)
    ap.add_argument("--force_horizontal", action="store_true")
    ap.add_argument("--grid_resolution", type=float, default=0.05)
    args = ap.parse_args(argv)
    out = depth_image_to_floorplan(
        args.image_path, args.output_dir, height_threshold=args.height_threshold,
        threshold_factor=args.threshold_factor,
        force_horizontal=args.force_horizontal,
        grid_resolution=args.grid_resolution,
    )
    print(f"wrote {out}")


if __name__ == "__main__":  # pragma: no cover
    main()
