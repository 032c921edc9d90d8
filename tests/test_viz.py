"""Viz layer: rendering shapes, palette parity, PNG round-trip."""

import io
import zlib

import numpy as np

from audio_triangulation_tpu.core.config import GridConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.viz import png as png_mod
from audio_triangulation_tpu.viz import render
from audio_triangulation_tpu.viz.raster import Canvas, VGA16, WHITE
from audio_triangulation_tpu.utils import golden

GRID = GridConfig()
MICS = geometry.reference_array()


def test_canvas_primitives():
    c = Canvas(64, 48)
    c.fill_rect(10, 10, 5, 5, WHITE)
    assert (c.rgb[10:15, 10:15] == 255).all()
    c.line(0, 0, 63, 47, 4)
    assert tuple(c.rgb[0, 0]) == tuple(VGA16[4])
    assert tuple(c.rgb[47, 63]) == tuple(VGA16[4])
    c.circle(32, 24, 10, 2)
    assert tuple(c.rgb[24, 42]) == tuple(VGA16[2])


def test_heatmap_levels_palette_matches_reference_colors(rng):
    """Level image colors must map exactly like vga_draw_heatmap's
    white/green/red/blue/black scheme."""
    scores = rng.integers(0, 10**6, size=(101, 101)).astype(np.int64)
    levels = golden.heatmap_colors(scores)
    img = render.heatmap_rgb(levels, GRID, cell_px=1, axes=False)
    # max cell is white
    y, x = np.unravel_index(scores.argmax(), scores.shape)
    assert tuple(img[y, x]) == (255, 255, 255)
    # level 0 cells are black
    yz, xz = np.nonzero(levels == 0)
    assert (img[yz, xz] == 0).all()


def test_heatmap_continuous_and_markers():
    scores = np.linspace(0, 1, 101 * 101).reshape(101, 101)
    img = render.heatmap_rgb(
        scores, GRID, mode="continuous", mic_positions=MICS, cell_px=4)
    assert img.shape == (404, 404, 3)
    assert img.max() == 255


def test_panels_shapes(rng):
    frames = rng.normal(size=(3, 1024))
    wf = render.waveform_panel(frames, np.array([0, 5, -3]))
    assert wf.shape == (81, 160, 3)
    corr = rng.normal(size=(3, 93))
    cp = render.correlogram_panel(corr)
    assert cp.shape == (81, 160, 3)


def test_status_text_format():
    s = render.status_text(
        frame_powers=[100, 200, 300],
        best_shifts=[1, -2, 3],
        mic_positions=MICS,
        pair_names=["AB", "AC", "BC"],
    )
    assert "Mic A" in s and "Shift AB:  +1" in s and "Mic Positions" in s


def test_dashboard_composes(rng):
    frames = rng.normal(size=(3, 1024))
    corr = rng.normal(size=(3, 93))
    scores = rng.integers(0, 10**6, size=101 * 101).astype(np.int64)
    levels = golden.heatmap_colors(scores.reshape(101, 101))
    img = render.dashboard(
        frames=frames, correlograms=corr,
        heat_levels_or_scores=levels, grid=GRID,
        mic_positions=MICS, best_shifts=np.array([4, -6, 2]),
        status=render.status_text(best_shifts=[4, -6, 2]),
    )
    assert img.shape == (480, 640, 3)
    assert img.any()


def test_png_roundtrip(rng):
    rgb = rng.integers(0, 255, size=(20, 30, 3)).astype(np.uint8)
    data = png_mod.png_bytes(rgb)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # decode IDAT and verify raw pixel bytes
    idat_pos = data.find(b"IDAT")
    size = int.from_bytes(data[idat_pos - 4: idat_pos], "big")
    raw = zlib.decompress(data[idat_pos + 4: idat_pos + 4 + size])
    rows = np.frombuffer(raw, np.uint8).reshape(20, 1 + 30 * 3)
    assert (rows[:, 0] == 0).all()
    np.testing.assert_array_equal(
        rows[:, 1:].reshape(20, 30, 3), rgb)


def test_terminal_heatmap_ansi(rng):
    from audio_triangulation_tpu.viz import terminal

    levels = rng.integers(0, 5, size=101 * 101).astype(np.uint8)
    art = terminal.heatmap_ansi(levels, 101, 101, max_cols=32)
    assert "\x1b[38;5;" in art and art.endswith("\x1b[0m")
    # continuous mode
    scores = rng.normal(size=101 * 101)
    art2 = terminal.heatmap_ansi(scores, 101, 101, mode="ramp", max_cols=16)
    assert art2.count("\n") > 5


def test_live_view_rewrites(capsys):
    import io

    from audio_triangulation_tpu.viz import terminal

    buf = io.StringIO()
    lv = terminal.LiveView(out=buf)
    lv.update("line1\nline2")
    lv.update("next")
    s = buf.getvalue()
    assert "line1" in s and "\x1b[2F" in s


def test_live_view_delta_redraw_skips_unchanged_lines():
    """Same-height frames rewrite ONLY changed lines (the terminal
    analogue of the reference's changed-cells heatmap redraw,
    vga_heatmap.h:128-133)."""
    import io

    from audio_triangulation_tpu.viz import terminal

    buf = io.StringIO()
    lv = terminal.LiveView(out=buf)
    lv.update("header\nrowA\nrowB")
    mark = buf.tell()
    lv.update("header\nrowA CHANGED\nrowB")
    delta = buf.getvalue()[mark:]
    # repositions to the 3-line block top, rewrites only the middle line
    assert delta.startswith("\x1b[3F")
    assert "rowA CHANGED" in delta and delta.count("\x1b[2K") == 1
    assert "header" not in delta and "rowB" not in delta
    # a frame of different height falls back to a full rewrite
    mark = buf.tell()
    lv.update("only")
    tail = buf.getvalue()[mark:]
    assert "\x1b[J" in tail and "only" in tail


# ----------------------------------------------------------------------
# Embedded 5x7 font (round-1 gap: Canvas.text silently no-oped without PIL)


def test_font_glyphs_well_formed():
    from audio_triangulation_tpu.viz import font5x7

    # every printable ASCII char has a compiled [7, 5] bitmap
    for code in range(32, 127):
        g = font5x7.glyph(chr(code))
        assert g.shape == (7, 5)
        if chr(code) != " ":
            assert g.any(), chr(code)
    # a few structural checks: '-' is a single middle row, '|' a column
    dash = font5x7.glyph("-")
    assert dash[3].all() and dash.sum() == 5
    pipe = font5x7.glyph("|")
    assert pipe[:, 2].all() and pipe.sum() == 7


def test_canvas_text_renders_pixels():
    from audio_triangulation_tpu.viz.raster import Canvas

    c = Canvas(120, 20, background=(0, 0, 0))
    c.text("XY=0.5", 2, 2, 15)
    lit = (c.rgb != 0).any(axis=-1)
    assert lit.sum() > 40  # real glyph pixels, not a no-op
    # pixels confined to the text box (7 rows starting at y=2)
    ys, xs = lit.nonzero()
    assert ys.min() >= 2 and ys.max() <= 8
    # scaled text scales the footprint
    c2 = Canvas(120, 40)
    c2.text("A", 0, 0, 15, size=20)
    lit2 = (c2.rgb != 0).any(axis=-1)
    assert lit2[:14, :10].sum() == 4 * font_glyph_pixel_count("A")


def font_glyph_pixel_count(ch):
    from audio_triangulation_tpu.viz import font5x7

    return int(font5x7.glyph(ch).sum())


def test_canvas_text_multiline_and_clipping():
    from audio_triangulation_tpu.viz.raster import Canvas

    c = Canvas(30, 30)
    c.text("AB\nCD", 0, 0, 15)
    lit = (c.rgb != 0).any(axis=-1)
    assert lit[:7].any() and lit[9:16].any()
    # clipped draws must not raise or wrap
    c.text("CLIPPED", -3, 28, 15)
    c.text("OFF", 40, 40, 15)


def test_ellipse_primitive_draws_closed_outline():
    from audio_triangulation_tpu.viz.raster import Canvas

    c = Canvas(100, 100)
    c.ellipse(50, 50, 30, 15, np.deg2rad(30.0), 12)
    drawn = np.argwhere((c.rgb != 0).any(axis=-1))
    assert len(drawn) > 40
    # all drawn pixels lie in the ellipse's bounding annulus
    d = np.linalg.norm(drawn - np.array([50, 50]), axis=-1)
    assert d.max() <= 31.5 and d.min() >= 13.0, (d.min(), d.max())


def test_overlay_uncertainty_marks_position():
    from audio_triangulation_tpu.core.config import GridConfig
    from audio_triangulation_tpu.viz import render

    grid = GridConfig()
    levels = np.zeros(grid.num_cells, np.uint8)
    img = render.heatmap_rgb(levels, grid, mode="levels")
    before = img.copy()
    xy = np.array([0.5, 0.4])
    cov = np.diag([0.01, 0.0025])  # 10 cm / 5 cm sigmas
    out = render.overlay_uncertainty(img, grid, xy, cov)
    assert out is img
    changed = np.argwhere((img != before).any(axis=-1))
    assert len(changed) > 20
    # changed pixels cluster around the projected position
    cell = 4
    cx = grid.half_cells_x * cell + cell // 2 + xy[0] * grid.cells_per_m * cell
    cy = grid.half_cells_y * cell + cell // 2 - xy[1] * grid.cells_per_m * cell
    d = np.linalg.norm(changed - np.array([cy, cx]), axis=-1)
    # 2 sigma * 0.1 m * 24 cells/m * 4 px = ~19 px major axis
    assert d.max() < 30, d.max()


def test_dashboard_with_uncertainty_overlay():
    from audio_triangulation_tpu.core.config import GridConfig
    from audio_triangulation_tpu.viz import render

    grid = GridConfig()
    img = render.dashboard(
        frames=np.random.default_rng(0).normal(size=(3, 1024)),
        correlograms=np.random.default_rng(1).normal(size=(3, 93)),
        heat_levels_or_scores=np.zeros(grid.num_cells, np.uint8),
        grid=grid,
        mic_positions=np.zeros((3, 2)),
        xy=np.array([0.3, -0.2]),
        xy_cov=np.diag([0.004, 0.004]),
    )
    assert img.shape == (480, 640, 3)


def test_volume_panels_marks_peak():
    """volume_panels: top+side MIP views; the xyz marker lands on the
    brightest cell of each projection."""
    import numpy as np

    from audio_triangulation_tpu.core.config import VolumeConfig
    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.viz import render

    vol = VolumeConfig(half_cells_x=10, half_cells_y=10, cells_per_m=10.0,
                       z_min_m=0.5, z_max_m=1.5, z_cells=11)
    true = np.array([0.3, -0.2, 1.1])
    pts = geometry.volume_points(vol).astype(np.float64)
    scores = np.exp(-((pts - true) ** 2).sum(-1) / 0.02).reshape(-1)
    img = render.volume_panels(
        scores, vol, mic_positions=geometry.tetrahedral_array(0.2),
        xyz=true, cell_px=4)
    assert img.ndim == 3 and img.shape[2] == 3
    # both panels present: width covers top + gap + side
    assert img.shape[1] >= 2 * vol.width * 4
    # the hottest pixels (white ramp end) exist in both halves
    half = img.shape[1] // 2
    assert img[:, :half].max() > 200 and img[:, half:].max() > 200
