import importlib.util
import os
import sys

import numpy as np
import pytest
from PIL import Image

_spec = importlib.util.spec_from_file_location(
    "make_comparison",
    os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts",
                 "make_comparison.py"))
mc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(mc)


def _png(path, color, size=(64, 48)):
    Image.new("RGB", size, color).save(path)
    return path


def test_strip_and_gif(tmp_path):
    a = _png(tmp_path / "a.png", (255, 0, 0))
    b = _png(tmp_path / "b.png", (0, 0, 255))
    out = str(tmp_path / "cmp")
    written = mc.make_comparison([f"red={a}", f"blue={b}"], out=out,
                                 gif=True, fps=2.0)
    assert written == [out + ".png", out + ".gif"]
    strip = Image.open(out + ".png")
    assert strip.size == (128, 48)
    gif = Image.open(out + ".gif")
    assert getattr(gif, "n_frames", 1) == 2


def test_directory_inputs_pick_image(tmp_path):
    for name, color in [("ours", (0, 255, 0)), ("ref", (255, 255, 0))]:
        d = tmp_path / name
        d.mkdir()
        _png(d / "0000.png", color)
    written = mc.make_comparison(
        [f"ours={tmp_path/'ours'}", f"ref={tmp_path/'ref'}"],
        image="0000.png", out=str(tmp_path / "cmp"))
    assert os.path.exists(written[0])


def test_directory_without_image_errors(tmp_path):
    d = tmp_path / "results"
    d.mkdir()
    with pytest.raises(SystemExit):
        mc.make_comparison([f"x={d}"], out=str(tmp_path / "cmp"))


def test_mixed_heights_resized(tmp_path):
    a = _png(tmp_path / "a.png", (1, 2, 3), size=(64, 48))
    b = _png(tmp_path / "b.png", (3, 2, 1), size=(32, 96))
    written = mc.make_comparison([f"a={a}", f"b={b}"],
                                 out=str(tmp_path / "cmp"))
    strip = Image.open(written[0])
    assert strip.height == 48 and strip.width == 64 + 16


def test_cli_main(tmp_path):
    a = _png(tmp_path / "a.png", (9, 9, 9))
    assert mc.main([f"a={a}", "--out", str(tmp_path / "c"), "--gif"]) == 0
    assert os.path.exists(tmp_path / "c.gif")


def test_gallery_helpers():
    import importlib.util
    import os

    import numpy as np
    spec = importlib.util.spec_from_file_location(
        "make_gallery",
        os.path.join(os.path.dirname(__file__), os.pardir, "util_scripts",
                     "make_gallery.py"))
    mg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mg)

    raw = np.zeros((2, 2, 4), np.float32)
    raw[..., 0] = 0.8          # R
    raw[..., 1] = 0.2          # G1
    raw[..., 2] = 0.6          # G2
    raw[..., 3] = 0.1          # B
    rgb = mg._pseudo_rgb_x(raw, scale=3)
    assert rgb.shape == (6, 6, 3)
    np.testing.assert_allclose(rgb[0, 0], [0.8, 0.4, 0.1])
    # nearest upscale: constant within each 3x3 block
    assert (rgb[:3, :3] == rgb[0, 0]).all()

    g = mg._gamma(np.array([0.0, 0.25, 1.0, 1.7]))
    assert g[0] == 0.0 and g[2] == 1.0 and g[3] == 1.0
    assert 0.25 < g[1] < 1.0  # gamma brightens linear mid-tones
