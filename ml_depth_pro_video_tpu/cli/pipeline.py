"""Console-script shim for the video pipeline (``depth-pro-video``)."""

from ..video.pipeline import main  # noqa: F401

if __name__ == "__main__":  # pragma: no cover
    main()
