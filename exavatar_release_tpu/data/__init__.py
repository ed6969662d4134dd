"""Dataset layer: COLMAP parsing + NeuMan/Custom subject loaders.

Equivalent of the reference's data layer (reference avatar/data/{NeuMan,
Custom}/ and fitting/data/): on-disk layout is IDENTICAL (COLMAP txt,
masks, keypoint jsons, smplx_optimized/*.json, face texture pngs) so a user
can point this framework at a reference-prepared subject directory.
"""
from .colmap import parse_cameras_txt, parse_images_txt, parse_points3d_txt
from .subject import (
    SubjectData,
    bbox_from_keypoints,
    camera_distribution,
    load_subject,
)

__all__ = [
    "parse_cameras_txt",
    "parse_images_txt",
    "parse_points3d_txt",
    "SubjectData",
    "bbox_from_keypoints",
    "camera_distribution",
    "load_subject",
]
