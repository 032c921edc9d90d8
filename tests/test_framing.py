"""Overlap framing: reshape-interleave fast path vs the gather reference."""

import numpy as np
import jax.numpy as jnp

from audio_triangulation_tpu.ops import framing


def _ref_frames(stream, n, hop):
    t = stream.shape[-1]
    k = (t - n) // hop + 1
    return np.stack([stream[..., i * hop: i * hop + n] for i in range(k)],
                    axis=-2)


def test_fast_path_matches_gather(rng):
    for t, n, hop in [(8192, 1024, 512), (4096, 1024, 256), (5000, 512, 512),
                      (3000, 1024, 1024), (2100, 1024, 512)]:
        s = rng.normal(size=(t,)).astype(np.float32)
        got = np.asarray(framing.frame_stream(jnp.asarray(s), n, hop))
        ref = _ref_frames(s, n, hop)
        assert got.shape == ref.shape, (t, n, hop, got.shape, ref.shape)
        np.testing.assert_array_equal(got, ref)


def test_general_hop(rng):
    s = rng.normal(size=(4000,)).astype(np.float32)
    got = np.asarray(framing.frame_stream(jnp.asarray(s), 1024, 300))
    ref = _ref_frames(s, 1024, 300)
    np.testing.assert_array_equal(got, ref)


def test_multichannel(rng):
    s = rng.normal(size=(3, 6000)).astype(np.float32)
    got = np.asarray(framing.frame_multichannel(jnp.asarray(s), 1024, 512))
    assert got.shape == ((6000 - 1024) // 512 + 1, 3, 1024)
    ref = _ref_frames(s, 1024, 512)  # [3, F, N]
    np.testing.assert_array_equal(got, np.moveaxis(ref, 0, 1))


def test_lane_framing_matches_time_order():
    """frame_multichannel_lanes + order == frame_multichannel, for even
    and odd frame counts and hops dividing the frame."""
    import numpy as np
    import jax.numpy as jnp

    from audio_triangulation_tpu.ops import framing

    rng = np.random.default_rng(3)
    for t_len, n, hop in ((96 * 16 + 16, 16, 8), (40 * 8, 8, 4),
                          (33 * 12 + 12, 12, 4)):
        stream = jnp.asarray(rng.normal(0, 1, (3, t_len)), jnp.float32)
        want = np.asarray(framing.frame_multichannel(stream, n, hop))
        got, order = framing.frame_multichannel_lanes(stream, n, hop)
        got = np.asarray(got)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got[order], want)
