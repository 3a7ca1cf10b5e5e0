"""Unit tests of the DPX-equivalent ops layer.

Every assertion from the reference's intrinsic test suite
(c++/testFakeDPX.cpp:10-114) is carried over, including the signed/unsigned
packed-halfword edge cases and the predicate tie semantics.
"""

import numpy as np
import pytest

from tpu_align.ops import dpx


def u32(x):
    return np.uint32(x & 0xFFFFFFFF)


def check(got, want):
    got = int(np.asarray(got).reshape(()).item()) & 0xFFFFFFFF
    assert got == (want & 0xFFFFFFFF), f"got {got:#x}, want {want:#x}"


def check_pred(got, want):
    assert bool(np.asarray(got).reshape(()).item()) == want


class TestMax3Min3:
    def test_vimax3_s32(self):
        check(dpx.vimax3_s32(1, 2, 3), 3)
        check(dpx.vimax3_s32(2, 3, 1), 3)
        assert int(np.asarray(dpx.vimax3_s32(-5, -10, -30))) == -5

    def test_vimax3_s16x2(self):
        check(dpx.vimax3_s16x2(u32(0), u32(0x00FF00FF), u32(0xFF00FF00)), 0x00FF00FF)
        check(dpx.vimax3_s16x2(u32(0), u32(0xFFFF00FF), u32(0xFFFFFF00)), 0x000000FF)
        check(
            dpx.vimax3_s16x2(u32(0xFFFD00FF), u32(0xFFFE00FF), u32(0xFFFFFF00)),
            0xFFFF00FF,
        )

    def test_vimax3_u32(self):
        check(dpx.vimax3_u32(u32(1), u32(2), u32(3)), 3)
        check(dpx.vimax3_u32(u32(2), u32(3), u32(0)), 3)

    def test_vimax3_u16x2(self):
        check(dpx.vimax3_u16x2(u32(0), u32(0x00FF00FF), u32(0xFF00FF00)), 0xFF00FF00)
        check(dpx.vimax3_u16x2(u32(0), u32(0xFFFF00FF), u32(0xFFFFFF00)), 0xFFFFFF00)
        check(
            dpx.vimax3_u16x2(u32(0xFFFD00FF), u32(0xFFFE00FF), u32(0xFFFFFF00)),
            0xFFFFFF00,
        )

    def test_vimin3_s32(self):
        check(dpx.vimin3_s32(1, 2, 3), 1)
        check(dpx.vimin3_s32(2, 3, 1), 1)
        assert int(np.asarray(dpx.vimin3_s32(-5, -10, -30))) == -30

    def test_vimin3_s16x2(self):
        check(dpx.vimin3_s16x2(u32(0), u32(0x00FF00FF), u32(0xFF00FF00)), 0xFF00FF00)
        check(dpx.vimin3_s16x2(u32(0), u32(0xFFFF00FF), u32(0xFFFFFF00)), 0xFFFFFF00)
        check(
            dpx.vimin3_s16x2(u32(0xFFFD00FF), u32(0xFFFE00FF), u32(0xFFFFFF00)),
            0xFFFDFF00,
        )

    def test_vimin3_u32(self):
        check(dpx.vimin3_u32(u32(1), u32(2), u32(3)), 1)
        check(dpx.vimin3_u32(u32(2), u32(3), u32(0)), 0)

    def test_vimin3_u16x2(self):
        check(dpx.vimin3_u16x2(u32(0), u32(0x00FF00FF), u32(0xFF00FF00)), 0)
        check(dpx.vimin3_u16x2(u32(0), u32(0xFFFF00FF), u32(0xFFFFFF00)), 0)
        check(
            dpx.vimin3_u16x2(u32(0xFFFD00FF), u32(0xFFFE00FF), u32(0xFFFFFF00)),
            0xFFFD00FF,
        )


class TestRelu:
    def test_vimax_s32_relu(self):
        check(dpx.vimax_s32_relu(1, 2), 2)
        check(dpx.vimax_s32_relu(2, 3), 3)
        check(dpx.vimax_s32_relu(-10, -30), 0)

    def test_vimax_s16x2_relu(self):
        check(dpx.vimax_s16x2_relu(u32(0x00FF00FF), u32(0xFF00FF00)), 0x00FF00FF)
        check(dpx.vimax_s16x2_relu(u32(0xFFFF00FF), u32(0xFFFFFF00)), 0x000000FF)
        check(dpx.vimax_s16x2_relu(u32(0xFFFD00FF), u32(0xFFFFFF00)), 0x000000FF)

    def test_vimin_s32_relu(self):
        check(dpx.vimin_s32_relu(1, 2), 1)
        check(dpx.vimin_s32_relu(2, 3), 2)
        check(dpx.vimin_s32_relu(-10, -30), 0)

    def test_vimin_s16x2_relu(self):
        check(dpx.vimin_s16x2_relu(u32(0x00FF00FF), u32(0xFF00FF00)), 0)
        check(dpx.vimin_s16x2_relu(u32(0xFFFF00FF), u32(0xFFFFFF00)), 0)
        check(dpx.vimin_s16x2_relu(u32(0xFFFD00FF), u32(0xFFFF0001)), 0x00000001)

    def test_vimax3_s32_relu(self):
        check(dpx.vimax3_s32_relu(1, 2, 3), 3)
        check(dpx.vimax3_s32_relu(2, 3, 1), 3)
        check(dpx.vimax3_s32_relu(-5, -10, -30), 0)

    def test_vimax3_s16x2_relu(self):
        check(
            dpx.vimax3_s16x2_relu(u32(0), u32(0x00FF00FF), u32(0xFF00FF00)),
            0x00FF00FF,
        )
        check(
            dpx.vimax3_s16x2_relu(u32(0), u32(0xFFFF00FF), u32(0xFFFFFF00)),
            0x000000FF,
        )
        check(
            dpx.vimax3_s16x2_relu(u32(0xFFFD00FF), u32(0xFFFE00FF), u32(0xFFFFFF00)),
            0x000000FF,
        )

    def test_vimin3_s32_relu(self):
        check(dpx.vimin3_s32_relu(1, 2, 3), 1)
        check(dpx.vimin3_s32_relu(2, 3, 1), 1)
        check(dpx.vimin3_s32_relu(-5, -10, -30), 0)

    def test_vimin3_s16x2_relu(self):
        check(dpx.vimin3_s16x2_relu(u32(0), u32(0x00FF00FF), u32(0xFF00FF00)), 0)
        check(dpx.vimin3_s16x2_relu(u32(0), u32(0xFFFF00FF), u32(0xFFFFFF00)), 0)
        check(
            dpx.vimin3_s16x2_relu(u32(0xFFFD00FF), u32(0xFFFE00FF), u32(0xFFFF0001)),
            0x00000001,
        )


class TestPredicated:
    def test_vibmax_s32(self):
        v, p = dpx.vibmax_s32(1, 2)
        check(v, 2)
        check_pred(p, False)
        v, p = dpx.vibmax_s32(2, 3)
        check(v, 3)
        check_pred(p, False)
        v, p = dpx.vibmax_s32(-10, -30)
        assert int(np.asarray(v)) == -10
        check_pred(p, True)

    def test_vibmax_s32_tie_prefers_first(self):
        v, p = dpx.vibmax_s32(7, 7)
        check(v, 7)
        check_pred(p, True)

    def test_vibmax_u32(self):
        v, p = dpx.vibmax_u32(u32(1), u32(2))
        check(v, 2)
        check_pred(p, False)
        v, p = dpx.vibmax_u32(u32(3), u32(2))
        check(v, 3)
        check_pred(p, True)

    def test_vibmin_s32(self):
        v, p = dpx.vibmin_s32(1, 2)
        check(v, 1)
        check_pred(p, True)
        v, p = dpx.vibmin_s32(2, 2)
        check(v, 2)
        check_pred(p, True)  # tie -> first arg (testFakeDPX.cpp:85)
        v, p = dpx.vibmin_s32(2, 3)
        check(v, 2)
        check_pred(p, True)
        v, p = dpx.vibmin_s32(-10, -30)
        assert int(np.asarray(v)) == -30
        check_pred(p, False)

    def test_vibmin_u32(self):
        v, p = dpx.vibmin_u32(u32(1), u32(2))
        check(v, 1)
        check_pred(p, True)
        v, p = dpx.vibmin_u32(u32(3), u32(2))
        check(v, 2)
        check_pred(p, False)

    @pytest.mark.parametrize(
        "fn,a,b,want,ph,pl",
        [
            (dpx.vibmax_s16x2, 0x00FF00FF, 0xFF00FF00, 0x00FF00FF, True, True),
            (dpx.vibmax_s16x2, 0xFFFF00FF, 0xFFFFFF00, 0xFFFF00FF, True, True),
            (dpx.vibmax_s16x2, 0xFFFD00FF, 0xFFFE01FF, 0xFFFE01FF, False, False),
            (dpx.vibmax_u16x2, 0x00FF00FF, 0xFF00FF00, 0xFF00FF00, False, False),
            (dpx.vibmax_u16x2, 0xFFFF00FF, 0xFFFFFF00, 0xFFFFFF00, True, False),
            (dpx.vibmax_u16x2, 0xFFFD00FF, 0xFFFE01FF, 0xFFFE01FF, False, False),
            (dpx.vibmin_s16x2, 0x00FF00FF, 0xFF00FF00, 0xFF00FF00, False, False),
            (dpx.vibmin_s16x2, 0xFFFF00FF, 0xFFFFFF00, 0xFFFFFF00, True, False),
            (dpx.vibmin_s16x2, 0xFFFD00FF, 0xFFFE01FF, 0xFFFD00FF, True, True),
            (dpx.vibmin_u16x2, 0x00FF00FF, 0xFF00FF00, 0x00FF00FF, True, True),
            (dpx.vibmin_u16x2, 0xFFFF00FF, 0xFFFFFF00, 0xFFFF00FF, True, True),
            (dpx.vibmin_u16x2, 0xFFFD00FF, 0xFFFE01FF, 0xFFFD00FF, True, True),
        ],
    )
    def test_vib_x2(self, fn, a, b, want, ph, pl):
        v, got_ph, got_pl = fn(u32(a), u32(b))
        check(v, want)
        check_pred(got_ph, ph)
        check_pred(got_pl, pl)


class TestAddMax:
    def test_viaddmax_s32(self):
        check(dpx.viaddmax_s32(1, 2, 3), 3)
        check(dpx.viaddmax_s32(2, 3, 1), 5)
        assert int(np.asarray(dpx.viaddmax_s32(-5, -10, -30))) == -15

    def test_viaddmax_u32(self):
        check(dpx.viaddmax_u32(u32(1), u32(2), u32(3)), 3)
        check(dpx.viaddmax_u32(u32(2), u32(3), u32(7)), 7)

    def test_viaddmax_s16x2(self):
        # (1 + 2, 3) per lane and int16 wraparound behavior
        check(dpx.viaddmax_s16x2(u32(0x00010001), u32(0x00020002), u32(0x00030000)),
              0x00030003)
        # 0x7FFF + 1 wraps to -0x8000 in an int16 lane, so c wins
        check(dpx.viaddmax_s16x2(u32(0x7FFF0000), u32(0x00010000), u32(0x00000005)),
              0x00000005)

    def test_viaddmin_s32(self):
        check(dpx.viaddmin_s32(1, 2, 3), 3)
        check(dpx.viaddmin_s32(2, 3, 7), 5)

    def test_relu_fused(self):
        check(dpx.viaddmax_s32_relu(-5, -10, -30), 0)
        check(dpx.viaddmax_s32_relu(2, 3, 1), 5)
        check(dpx.viaddmin_s32_relu(-5, -10, -30), 0)
        check(dpx.viaddmax_s16x2_relu(u32(0xFFFF0002), u32(0xFFFF0003), u32(0xFF000001)),
              0x00000005)


class TestPacking:
    def test_pack_unpack_roundtrip(self):
        hi = np.array([-3, 5, -32768, 32767], np.int32)
        lo = np.array([7, -1, 32767, -32768], np.int32)
        packed = dpx.pack_s16x2(hi, lo)
        gh, gl = dpx.unpack_s16x2(packed)
        np.testing.assert_array_equal(np.asarray(gh), hi)
        np.testing.assert_array_equal(np.asarray(gl), lo)

    def test_elementwise_arrays(self):
        a = np.arange(-8, 8, dtype=np.int32)
        b = np.arange(8, -8, -1, dtype=np.int32)
        v, p = dpx.vibmax_s32(a, b)
        np.testing.assert_array_equal(np.asarray(v), np.maximum(a, b))
        np.testing.assert_array_equal(np.asarray(p), a >= b)
