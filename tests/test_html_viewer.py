"""Standalone interactive HTML viewer (weasal_tpu/utils/html_viewer.py).

The viewer is the environment's replacement for the reference's mayavi
windows (reference utils/visualizer.py:99-445); no browser or JS runtime
exists in this image, so these tests verify the Python contract end to end:
payload round-trip (the embedded base64 buffers decode back to the exact
points/colors the JS will render), color-mapping semantics, subsampling,
and the visualizer entry points that emit .html artifacts.
"""

import base64
import json
import os
import re

import numpy as np
import pytest

from weasal_tpu.utils.html_viewer import colors_to_rgb, export_html


def _payload(path):
    with open(path) as f:
        html = f.read()
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "embedded payload not found"
    return json.loads(m.group(1)), html


def _decode(spec):
    pos = np.frombuffer(base64.b64decode(spec["pos"]), np.float32)
    col = np.frombuffer(base64.b64decode(spec["col"]), np.uint8)
    return pos.reshape(spec["n"], 3), col.reshape(spec["n"], 3)


def test_payload_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 5, (257, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 257)
    kp = rng.normal(0, 1, (15, 3)).astype(np.float32)
    path = export_html(str(tmp_path / "v.html"),
                       layers=[("cloud", pts, labels, 1.5)],
                       frames=[("k0", kp, None, 8.0),
                               ("k1", kp + 1.0, None, 8.0)],
                       title="t", legend=["a", "b"])
    data, html = _payload(path)
    assert data["title"] == "t"
    assert [f["name"] for f in data["frames"]] == ["k0", "k1"]
    got, col = _decode(data["layers"][0])
    np.testing.assert_array_equal(got, pts)
    # integer labels map through the fixed palette, identically per label
    expect = colors_to_rgb(pts, labels)
    np.testing.assert_array_equal(col, expect)
    k0, _ = _decode(data["frames"][0])
    k1, _ = _decode(data["frames"][1])
    np.testing.assert_array_equal(k0, kp)
    np.testing.assert_array_equal(k1, np.asarray(kp + 1.0, np.float32))
    assert len(data["legend"]) == 2
    # self-contained: no external resources
    assert "http://" not in html and "https://" not in html
    assert "<canvas" in html and "WEBGL" not in html.upper().replace(
        "WEBGL\"", "")  # webgl context requested lowercase


def test_color_modes():
    pts = np.array([[0, 0, 0], [0, 0, 1], [0, 0, 2]], np.float32)
    # None -> height ramp: monotone z maps to increasing ramp position
    c = colors_to_rgb(pts, None)
    assert c.shape == (3, 3) and c.dtype == np.uint8
    assert not np.array_equal(c[0], c[2])
    # scalars -> ramp endpoints are the ramp's ends regardless of scale
    s = colors_to_rgb(pts, np.array([5.0, 6.0, 7.0]))
    np.testing.assert_array_equal(s[0], colors_to_rgb(
        pts, np.array([0.0, 0.5, 1.0]))[0])
    # explicit RGB passes through (0-1 floats scale to bytes)
    rgb = colors_to_rgb(pts, np.array([[1.0, 0, 0]] * 3))
    np.testing.assert_array_equal(rgb, [[255, 0, 0]] * 3)
    # constant scalar doesn't divide by zero
    colors_to_rgb(pts, np.zeros(3))


def test_subsampling_and_validation(tmp_path):
    pts = np.zeros((1000, 3), np.float32)
    path = export_html(str(tmp_path / "s.html"),
                       layers=[("big", pts, None, 1.0)], max_points=100)
    data, _ = _payload(path)
    assert data["layers"][0]["n"] == 100
    with pytest.raises(ValueError):
        export_html(str(tmp_path / "e.html"))
    with pytest.raises(ValueError):
        export_html(str(tmp_path / "e.html"),
                    layers=[("bad", np.zeros((4, 2)), None, 1.0)])


def test_script_breaking_names_are_escaped(tmp_path):
    """Layer names / titles come from caller-supplied paths: a literal
    '</script>' in them must not terminate the viewer's script block
    (payload escapes '</'), and the title must be HTML-escaped."""
    pts = np.zeros((4, 3), np.float32)
    path = export_html(str(tmp_path / "esc.html"),
                       layers=[("x</script>y", pts, None, 1.0)],
                       title="a</script><b>")
    data, html = _payload(path)
    # round-trips through JSON escaping back to the original strings
    assert data["layers"][0]["name"] == "x</script>y"
    assert data["title"] == "a</script><b>"
    # no raw terminator sequence survives anywhere in the document except
    # the real closing tags
    body = html.replace("</script>", "", 1)   # the template's own closer
    assert "</script>" not in body
    assert "<title>a&lt;/script&gt;&lt;b&gt;</title>" in html


def test_visualizer_emits_html(tmp_path):
    from weasal_tpu.utils.visualizer import show_point_cloud
    pts = np.random.default_rng(1).normal(0, 1, (50, 3)).astype(np.float32)
    prefix = str(tmp_path / "cloud")
    show_point_cloud(pts, labels=np.zeros(50, np.int32), out_prefix=prefix)
    assert os.path.exists(prefix + ".html")
    assert os.path.exists(prefix + ".ply")
    data, _ = _payload(prefix + ".html")
    assert data["layers"][0]["n"] == 50
