"""Runtime camera-image pipeline: decode, resize, normalize, pad.

Host-side equivalents of the reference's image pipeline stages:
  * det3d `LoadPointCloudImageFromFile`
    (CenterPoint/det3d/datasets/pipelines/loading.py:199) — decodes the 6
    nuScenes cameras + calib per training/eval step;
  * mmdet3d `LoadMultiViewImageFromFiles`
    (TransFusion/mmdet3d/datasets/pipelines/loading.py:420) with
    `MyResize` (:10), `MyNormalize` (:306) and `MyPad` (:348);
  * pcdet `get_image` (VoxelRCNN/pcdet/datasets/kitti/kitti_dataset.py:68).

TPU-first design: all image work happens host-side in numpy at STATIC
shapes. The device only ever sees a fixed (num_cams, H, W, 3) float32
tensor plus per-camera (3, 4) projection matrices with the resize factors
folded into the intrinsic rows — no dynamic shapes, no device-side decode.
keep_ratio resizing + bottom/right zero padding matches MyResize
(keep_ratio=True) followed by MyPad, and the padded region is dead weight
the projections never map into (points project into the scaled image
extent only).
"""

from __future__ import annotations

import numpy as np

# mmdet3d/det3d img_norm_cfg used by every 3D-Dual-Fusion config
# (TransFusion/configs/transfusion_nusc_voxel_F.py img_norm_cfg)
IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


def decode_image(path) -> np.ndarray:
    """JPEG/PNG -> (H, W, 3) uint8 RGB."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "the runtime image pipeline needs Pillow (PIL) to decode "
            f"camera JPEGs; install it or run with synthetic images: {e}"
        ) from e
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def resize_normalize_pad(
    img: np.ndarray,
    target_hw: tuple[int, int],
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
    keep_ratio: bool = True,
):
    """uint8 (H, W, 3) -> float32 (th, tw, 3) + the (sy, sx) scale applied.

    MyResize(keep_ratio=True) semantics: scale = min over dims of
    target/size (never upscale-distorts aspect), bilinear; then MyNormalize
    (RGB mean/std); then MyPad to the static target with zeros
    bottom/right."""
    th, tw = int(target_hw[0]), int(target_hw[1])
    h, w = img.shape[:2]
    if keep_ratio:
        s = min(th / h, tw / w)
        sy = sx = s
    else:
        sy, sx = th / h, tw / w
    nh, nw = min(th, max(1, int(round(h * sy)))), min(tw, max(1, int(round(w * sx))))
    if (nh, nw) != (h, w):
        from PIL import Image

        img = np.asarray(
            Image.fromarray(img).resize((nw, nh), Image.BILINEAR)
        )
        # the ACTUAL applied scale (rounding): projections must match
        sy, sx = nh / h, nw / w
    out = np.zeros((th, tw, 3), np.float32)
    out[:nh, :nw] = (img.astype(np.float32) - mean) / std
    return out, (sy, sx)


def scale_projection(proj: np.ndarray, sy: float, sx: float) -> np.ndarray:
    """Fold a resize into a lidar->image (3, 4) projection: u' = sx*u,
    v' = sy*v (rows 0/1 scale; the depth row is untouched)."""
    out = np.asarray(proj, np.float32).copy()
    out[0] *= sx
    out[1] *= sy
    return out


def load_camera_frame(
    paths,
    projs: np.ndarray,
    target_hw: tuple[int, int],
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
    keep_ratio: bool = True,
):
    """Decode + preprocess one frame's cameras.

    paths: list[str] of num_cams image files; projs (num_cams, 3, 4)
    lidar->image matrices at ORIGINAL resolution.
    Returns (images (num_cams, th, tw, 3) float32, proj (num_cams, 3, 4))
    with the resize folded into the projections.
    """
    images, out_projs = [], []
    for path, proj in zip(paths, np.asarray(projs, np.float32)):
        img = decode_image(path)
        img, (sy, sx) = resize_normalize_pad(
            img, target_hw, mean, std, keep_ratio)
        images.append(img)
        out_projs.append(scale_projection(proj, sy, sx))
    return np.stack(images), np.stack(out_projs)


def finalize_camera_sample(
    sample: dict,
    target_hw: tuple[int, int],
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
):
    """Post-augmentation image finalization for single-camera datasets
    (KITTI): sample['image'] (H, W, 3) uint8 raw + sample['proj'] (3, 4)
    -> sample['images'] (1, th, tw, 3) float32 + sample['proj'] (1, 3, 4),
    the exact layout the fused models take (same as nuScenes 6-cam)."""
    img, (sy, sx) = resize_normalize_pad(
        sample["image"], target_hw, mean, std)
    sample = dict(sample)
    sample["images"] = img[None]
    sample["proj"] = scale_projection(sample["proj"], sy, sx)[None]
    return sample
