"""Image I/O and drawing tests (the simpleocv-analog surface)."""
import numpy as np

from simpleinfer_tpu.zoo.detect import Detection
from simpleinfer_tpu.zoo.imageio import (
    draw_detections,
    draw_rectangle,
    draw_text,
    imread,
    imwrite,
)

RNG = np.random.default_rng(61)


def test_ppm_roundtrip(tmp_path):
    img = RNG.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    p = str(tmp_path / "t.ppm")
    imwrite(p, img)
    back = imread(p)
    np.testing.assert_array_equal(back, img)


def test_png_roundtrip_via_pil(tmp_path):
    img = RNG.integers(0, 256, (20, 30, 3)).astype(np.uint8)
    p = str(tmp_path / "t.png")
    imwrite(p, img)
    back = imread(p)
    np.testing.assert_array_equal(back, img)


def test_bgr_rgb_convention(tmp_path):
    img_bgr = np.zeros((4, 4, 3), np.uint8)
    img_bgr[..., 0] = 250  # blue in BGR
    p = str(tmp_path / "c.png")
    imwrite(p, img_bgr)  # stored as RGB file
    rgb = imread(p, bgr=False)
    assert (rgb[..., 2] == 250).all() and (rgb[..., 0] == 0).all()


def test_draw_rectangle_edges():
    img = np.zeros((20, 20, 3), np.uint8)
    draw_rectangle(img, (2, 3), (10, 12), (0, 255, 0), thickness=1)
    assert (img[3, 2:11, 1] == 255).all()   # top edge
    assert (img[12, 2:11, 1] == 255).all()  # bottom edge
    assert (img[3:13, 2, 1] == 255).all()   # left edge
    assert (img[5, 5] == 0).all()           # interior untouched
    # out-of-bounds points are clipped, not crashing
    draw_rectangle(img, (-5, -5), (100, 100))


def test_draw_text_marks_pixels():
    img = np.zeros((20, 60, 3), np.uint8)
    draw_text(img, "A1", (2, 2), (255, 0, 0))
    assert (img[..., 0] > 0).any()


def test_draw_detections():
    img = RNG.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    dets = [Detection(box=(5, 5, 30, 40), score=0.87, class_id=0),
            Detection(box=(40, 10, 60, 50), score=0.5, class_id=2)]
    out = draw_detections(img, dets)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)  # something was drawn
    assert np.array_equal(img, np.asarray(img))  # original untouched


def test_ppm_pixel_starting_with_whitespace_byte(tmp_path):
    """P6 header ends after exactly ONE whitespace byte; pixels whose
    first bytes are 0x20/0x0A must survive round-trip."""
    from simpleinfer_tpu.zoo.imageio import imread, imwrite

    img = np.full((3, 3, 3), 40, np.uint8)
    img[0, 0] = (32, 10, 13)  # space, \n, \r as leading pixel bytes
    p = str(tmp_path / "ws.ppm")
    imwrite(p, img)  # writes BGR->RGB internally
    back = imread(p)
    np.testing.assert_array_equal(back, img)
