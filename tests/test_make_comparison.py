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
