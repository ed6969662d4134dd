"""Native C++ data loader: PNG decode parity vs cv2, threaded prefetch."""
import os

import numpy as np
import pytest

from exavatar_release_tpu.native import (
    NativeLoader,
    build_native,
    decode_png_native,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def png_files(tmp_path_factory, ):
    import cv2

    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    files = []
    for i, (h, w, c) in enumerate([(37, 53, 3), (16, 16, 3), (24, 31, 3)]):
        img = rng.integers(0, 255, (h, w, c), np.uint8)
        p = str(d / f"{i}.png")
        cv2.imwrite(p, img)
        files.append(p)
    # grayscale mask-style png
    m = (rng.uniform(size=(20, 22)) > 0.5).astype(np.uint8) * 255
    p = str(d / "mask.png")
    cv2.imwrite(p, m)
    files.append(p)
    return files


def test_decode_parity_vs_cv2(png_files):
    import cv2

    for p in png_files[:3]:
        arr = decode_png_native(p)
        ref = cv2.imread(p).astype(np.float32) / 255.0  # BGR HWC
        assert arr is not None
        np.testing.assert_allclose(
            arr.transpose(1, 2, 0)[..., ::-1], ref, atol=1e-6
        )


def test_grayscale_decode(png_files):
    import cv2

    arr = decode_png_native(png_files[3])
    ref = cv2.imread(png_files[3], cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
    assert arr.shape[0] == 1
    np.testing.assert_allclose(arr[0], ref, atol=1e-6)


def test_threaded_prefetch(png_files):
    import cv2

    with NativeLoader(num_threads=4, queue_cap=4) as ld:
        out = ld.map(png_files)
    assert set(out.keys()) == set(range(len(png_files)))
    ref = cv2.imread(png_files[0]).astype(np.float32) / 255.0
    np.testing.assert_allclose(
        out[0].transpose(1, 2, 0)[..., ::-1], ref, atol=1e-6
    )


def test_bad_path_reports_error():
    with NativeLoader(num_threads=1, queue_cap=2) as ld:
        ld.submit(7, "/nonexistent/file.png")
        rid, arr = ld.wait()
    assert rid == -2 and arr is None


def test_frame_prefetcher_matches_python_path(tmp_path):
    """FramePrefetcher must yield byte-identical frames to load_frame_arrays
    in the submitted order."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_data import make_synthetic_subject

    from exavatar_release_tpu.data.subject import (
        FramePrefetcher, load_frame_arrays, load_subject,
    )

    root = str(tmp_path / "subj")
    make_synthetic_subject(root, n_frames=3, H=24, W=32)
    subject = load_subject(root, split="train", repeat=1)
    order = [1, 0, 1, 2]
    with FramePrefetcher(subject, order, lookahead=2) as pf:
        got = list(pf)
    assert len(got) == len(order)
    for k, arrs in zip(order, got):
        ref = load_frame_arrays(subject, subject.frame_ids[k])
        assert arrs["frame_idx"] == ref["frame_idx"]
        np.testing.assert_array_equal(arrs["img"], ref["img"])  # bit-exact
        np.testing.assert_array_equal(arrs["mask"], ref["mask"])
        np.testing.assert_allclose(arrs["bbox"], ref["bbox"])
