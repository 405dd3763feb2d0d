"""Native (C++) component tests: the ctypes-bound planner and options DB
must agree exactly with their pure-Python twins (the cross-implementation
check methodology of the reference demo, src/example.f90:235-261, applied
to the host-side native layer)."""

import itertools

import pytest

from poissbox_tpu import native
from poissbox_tpu.config import Options
from poissbox_tpu.parallel import decomp as pydecomp


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available() and not native.build():
        pytest.skip("native toolchain unavailable")


class TestNativeDecomp:
    @pytest.mark.parametrize("ndev", [1, 2, 3, 4, 6, 8, 16, 64])
    def test_decompose_matches_python(self, ndev):
        for shape in [(64, 64, 64), (128, 64, 32), (60, 60, 60), (256, 256, 256)]:
            assert native.decompose_3d(ndev, shape) == \
                pydecomp.decompose_3d(ndev, shape), (ndev, shape)

    def test_reference_dof_split(self):
        # reference README.md:25-33
        assert sorted(native.dof_distribution((64, 64, 64), (3, 1, 1)),
                      reverse=True) == [90112, 86016, 86016]

    def test_owned_boxes_match_python(self):
        shape, pgrid = (10, 7, 5), (3, 2, 1)
        py = pydecomp.owned_boxes(shape, pgrid)
        for coord in itertools.product(range(3), range(2), range(1)):
            assert native.owned_box(shape, pgrid, coord) == py[coord]

    def test_dof_distribution_matches_python(self):
        for shape, pgrid in [((64, 64, 64), (2, 2, 2)),
                             ((65, 64, 63), (3, 2, 1)),
                             ((7, 7, 7), (2, 2, 2))]:
            assert native.dof_distribution(shape, pgrid) == \
                pydecomp.dof_distribution(shape, pgrid)

    def test_invalid_rejected(self):
        with pytest.raises(ValueError):
            native.decompose_3d(128, (2, 2, 2))

    def test_halo_bytes(self):
        # 64^3 f32 over (2,2,1): x and y exchange 2 * 32*64-plane... each
        # local block is (32, 32, 64); x-halo = 2*1*32*64*4
        got = native.halo_bytes((64, 64, 64), (2, 2, 1), width=1, itemsize=4)
        assert got == [2 * 32 * 64 * 4, 2 * 32 * 64 * 4, 0]


class TestNativeOptions:
    CASES = [
        ["-ksp_type", "cg", "-ksp_rtol", "1e-9"],
        ["-ksp_monitor", "-pc_type", "mg"],
        ["-ksp_rtol=1e-8", "-mg_levels", "3"],
        ["-ksp_shift", "-1.5e-3"],          # negative number as value
        ["stray", "-flag1", "-flag2", "val"],
        ["-a", "-b", "-c", "x", "-d=e"],
    ]

    @pytest.mark.parametrize("argv", CASES)
    def test_parse_matches_python(self, argv):
        py = Options(argv).as_dict()
        nat = native.NativeOptions(argv).as_dict()
        # python stores numbers as strings off the CLI too — compare direct
        assert nat == {k: v for k, v in py.items()}

    def test_set_get_roundtrip(self):
        db = native.NativeOptions()
        db.set("-ksp_rtol", 1e-10)
        db.set("monitor", True)
        assert db.has("ksp_rtol") and db.has("-monitor")
        assert db.get("ksp_rtol") == "1e-10"
        assert db.get("monitor") is True
        assert db.get("absent", "fallback") == "fallback"

    def test_overwrite_keeps_order(self):
        db = native.NativeOptions(["-a", "1", "-b", "2"])
        db.set("a", "3")
        assert db.keys() == ["a", "b"]
        assert db.get("a") == "3"
