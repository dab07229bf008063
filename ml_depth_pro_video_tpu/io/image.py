"""Image loading with EXIF focal-length extraction.

Behavioral parity with `/root/reference/src/depth_pro/utils.py:16-112`:
EXIF auto-rotation (orientations 3/6/8), grayscale->RGB, alpha strip,
and focal length from the 35mm-equivalent EXIF tag via
``f_px = f_mm * sqrt(w^2+h^2) / sqrt(36^2+24^2)``. HEIC decoding is
supported when pillow_heif is installed (gated import).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np
from PIL import ExifTags, Image, TiffTags

try:  # optional: HEIC support
    import pillow_heif

    pillow_heif.register_heif_opener()
    _HAS_HEIF = True
except ImportError:  # pragma: no cover
    _HAS_HEIF = False

LOGGER = logging.getLogger(__name__)


def extract_exif(img_pil: Image.Image) -> Dict[str, Any]:
    """EXIF + TIFF tags as a name->value dict."""
    exif = img_pil.getexif()
    ifd = exif.get_ifd(0x8769)
    out = {ExifTags.TAGS[k]: v for k, v in ifd.items() if k in ExifTags.TAGS}
    tiff = {TiffTags.TAGS_V2[k].name: v for k, v in exif.items() if k in TiffTags.TAGS_V2}
    out.update(tiff)
    return out


def fpx_from_f35(width: float, height: float, f_mm: float = 50) -> float:
    """35mm-equivalent focal length (mm) -> pixels for this image size."""
    return f_mm * np.sqrt(width**2.0 + height**2.0) / np.sqrt(36**2 + 24**2)


_ROTATIONS = {3: Image.ROTATE_180, 6: Image.ROTATE_270, 8: Image.ROTATE_90}


def load_rgb(
    path: Union[Path, str],
    auto_rotate: bool = True,
    remove_alpha: bool = True,
) -> Tuple[np.ndarray, List[bytes], Optional[float]]:
    """Load an RGB image.

    Returns (HxWx3 uint8 array, icc_profile, f_px or None).
    """
    path = Path(path)
    if path.suffix.lower() == ".heic":
        if not _HAS_HEIF:
            raise RuntimeError("HEIC input requires pillow_heif, which is not installed")
        heif = pillow_heif.open_heif(path, convert_hdr_to_8bit=True)
        img_pil = heif.to_pillow()
    else:
        img_pil = Image.open(path)

    img_exif = extract_exif(img_pil)
    icc_profile = img_pil.info.get("icc_profile", None)

    if auto_rotate:
        orientation = img_exif.get("Orientation", 1)
        if orientation in _ROTATIONS:
            img_pil = img_pil.transpose(_ROTATIONS[orientation])
        elif orientation != 1:
            LOGGER.warning("Ignoring image orientation %s.", orientation)

    img = np.array(img_pil)
    if img.ndim < 3 or img.shape[2] == 1:
        img = np.dstack((img, img, img))
    if remove_alpha:
        img = img[:, :, :3]

    f_35mm = img_exif.get(
        "FocalLengthIn35mmFilm",
        img_exif.get("FocalLenIn35mmFilm", img_exif.get("FocalLengthIn35mmFormat")),
    )
    # positive-value gate like the reference (`utils.py:106`): corrupt
    # EXIF (negative/zero f_35mm) must fall back to FOV estimation, not
    # produce a negative focal length
    valid_f35 = f_35mm is not None and isinstance(f_35mm, (int, float)) and f_35mm > 0
    f_px = fpx_from_f35(img.shape[1], img.shape[0], f_35mm) if valid_f35 else None
    return img, icc_profile, f_px


def load_stream_item(item, downscale_factor: float = 1.0):
    """Decode/normalize one video-stream item: path | (path, f_px) |
    ndarray. Returns (key, uint8 image, f_px).

    Lives in this jax-free module ON PURPOSE: the video runner's
    process decode pool ships it to pre-forked spawn workers, and the
    unpickling child imports only this module's dependency set
    (PIL/numpy) — never jax or the device client, which keeps worker
    spawn cheap and the isolation claim real (`video/runner.py`).
    """
    import os as _os

    f_px = None
    if isinstance(item, tuple):
        item, f_px = item
    if isinstance(item, (str, _os.PathLike)):
        img, _, exif_f = load_rgb(item)
        f_px = f_px if f_px is not None else exif_f
        key = str(item)
    else:
        img = np.asarray(item)
        key = None
    if img.dtype != np.uint8:
        # convert BEFORE any PIL resize: Image.fromarray cannot handle
        # float RGB arrays (they were silently dropped)
        if np.issubdtype(img.dtype, np.floating) and img.size and img.max() <= 1.0:
            img = img * 255.0  # [0,1] floats (plt.imread etc.)
        img = np.clip(img, 0, 255).astype(np.uint8)
    if downscale_factor != 1.0:
        h = int(img.shape[0] * downscale_factor)
        w = int(img.shape[1] * downscale_factor)
        if f_px is not None:
            f_px = f_px * downscale_factor
        img = np.asarray(Image.fromarray(img).resize((w, h), Image.BILINEAR))
    return key, img, f_px
