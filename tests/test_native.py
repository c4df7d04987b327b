"""C++ preprocessing library vs the numpy/cv2 reference path."""

import numpy as np
import pytest

from egovlpv2_tpu.data import native, transforms

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libvideoproc.so not built (make -C native)"
)


def test_resize_matches_cv2():
    rs = np.random.RandomState(0)
    clip = rs.randint(0, 256, (3, 37, 53, 3), np.uint8)
    got = native.resize_bilinear(clip, 24, 32)
    ref = transforms._resize_clip(clip.astype(np.float32), (24, 32))
    np.testing.assert_allclose(got, ref, atol=0.51)  # cv2 fixed-point vs float


def test_resize_f32_matches_cv2():
    rs = np.random.RandomState(1)
    clip = rs.rand(2, 40, 60, 3).astype(np.float32)
    got = native.resize_bilinear(clip, 17, 23)
    ref = transforms._resize_clip(clip, (17, 23))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_fused_crop_resize_normalize():
    rs = np.random.RandomState(2)
    clip = rs.randint(0, 256, (2, 50, 70, 3), np.uint8)
    mean, std = transforms.IMAGENET_MEAN, transforms.IMAGENET_STD
    got = native.crop_resize_normalize(clip, 5, 7, 40, 56, 32, False, mean, std)
    # reference path: crop -> /255 -> resize -> normalize
    ref_crop = clip[:, 5:45, 7:63].astype(np.float32) / 255.0
    ref = transforms._resize_clip(ref_crop, (32, 32))
    ref = (ref - mean) / std
    np.testing.assert_allclose(got, ref, atol=0.02)


def test_fused_hflip():
    rs = np.random.RandomState(3)
    clip = rs.randint(0, 256, (1, 32, 32, 3), np.uint8)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    plain = native.crop_resize_normalize(clip, 0, 0, 32, 32, 32, False, mean, std)
    flipped = native.crop_resize_normalize(clip, 0, 0, 32, 32, 32, True, mean, std)
    np.testing.assert_allclose(flipped, plain[:, :, ::-1], atol=1e-5)


def test_normalize_inplace():
    rs = np.random.RandomState(4)
    clip = rs.rand(2, 8, 8, 3).astype(np.float32)
    ref = (clip - transforms.IMAGENET_MEAN) / transforms.IMAGENET_STD
    got = native.normalize_inplace(clip.copy(), transforms.IMAGENET_MEAN,
                                   transforms.IMAGENET_STD)
    np.testing.assert_allclose(got, ref, rtol=1e-5)
