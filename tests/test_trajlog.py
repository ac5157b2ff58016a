"""Native async trajectory recorder (native/trajlog.cpp) round trip."""

import numpy as np

from pedoni_tpu import native


def test_trajectory_roundtrip(tmp_path):
    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    p = tmp_path / "run.traj"
    rng = np.random.default_rng(0)
    frames = []
    with native.TrajectoryWriter(p) as w:
        assert w.native
        for step in (1, 5, 9):
            n = int(rng.integers(0, 2000))
            pos = rng.uniform(0, 100, (n, 2)).astype(np.float32)
            dest = rng.integers(0, 6, n).astype(np.int32)
            frames.append((step, pos, dest))
            w.append(step, pos, dest)
    got = list(native.read_trajectory(p))
    assert len(got) == 3
    for (s0, p0, d0), (s1, p1, d1) in zip(frames, got):
        assert s0 == s1
        np.testing.assert_array_equal(p1, p0)
        np.testing.assert_array_equal(d1, d0)


def test_trajectory_magic_check(tmp_path):
    p = tmp_path / "bogus.traj"
    p.write_bytes(b"NOTATRAJ")
    import pytest

    with pytest.raises(ValueError):
        next(native.read_trajectory(p))
