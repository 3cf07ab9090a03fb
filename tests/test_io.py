"""u3d / dat volume IO round-trip tests (format parity with
uniformgrid3dreader.cpp / uniformgrid3dwriter.cpp)."""

import numpy as np
import pytest

from cpm_tpu.io import u3d


class TestU3D:
    def test_roundtrip_scalar_sequence(self, tmp_path):
        data = np.random.default_rng(0).random((4, 5, 6, 7)).astype(np.float32)
        path = str(tmp_path / "grid.u3d")
        u3d.write_u3d(path, data, cell_dimensions=(8, 8, 8))
        out = u3d.read_u3d(path)
        np.testing.assert_array_equal(out.data, data)
        assert out.cell_dimensions == (8, 8, 8)

    def test_roundtrip_minmax_vec2(self, tmp_path):
        rng = np.random.default_rng(1)
        data = rng.integers(0, 65535, (2, 3, 4, 5, 2)).astype(np.uint16)
        path = str(tmp_path / "mm.u3d")
        u3d.write_u3d(path, data, cell_dimensions=(4, 4, 4))
        out = u3d.read_u3d(path)
        np.testing.assert_array_equal(out.data, data)
        assert out.data.shape == (2, 3, 4, 5, 2)

    def test_matrices_roundtrip(self, tmp_path):
        data = np.zeros((1, 2, 2, 2), np.float32)
        mm = np.arange(16, dtype=np.float32).reshape(4, 4)
        path = str(tmp_path / "m.u3d")
        u3d.write_u3d(path, data, model_matrix=mm)
        out = u3d.read_u3d(path)
        np.testing.assert_allclose(out.model_matrix, mm)

    def test_header_is_ascii_keyvalue(self, tmp_path):
        data = np.zeros((1, 2, 2, 2), np.float32)
        path = str(tmp_path / "h.u3d")
        u3d.write_u3d(path, data)
        text = open(path).read()
        for key in ("RawFile:", "Resolution:", "Format:", "ModelMatrix:",
                    "WorldMatrix:", "CellDimensions:"):
            assert key in text

    def test_comments_and_blank_lines_ignored(self, tmp_path):
        data = np.ones((1, 2, 2, 2), np.float32)
        path = str(tmp_path / "c.u3d")
        u3d.write_u3d(path, data)
        raw = open(path).read()
        open(path, "w").write("# comment\n\n" + raw + "// trailing\n")
        out = u3d.read_u3d(path)
        np.testing.assert_array_equal(out.data, data)


class TestDatVolume:
    def test_roundtrip_float(self, tmp_path):
        data = np.random.default_rng(2).random((8, 9, 10)).astype(np.float32)
        path = str(tmp_path / "vol.dat")
        u3d.write_dat_volume(path, data)
        out, basis, offset = u3d.read_dat_volume(path)
        assert out.shape == (8, 9, 10)
        np.testing.assert_allclose(out, data, atol=1.0 / 65535)
        np.testing.assert_array_equal(basis, np.eye(3) * 2.0)

    def test_uint8_normalized(self, tmp_path):
        data = np.arange(8, dtype=np.uint8).reshape(2, 2, 2) * 32
        path = str(tmp_path / "v8.dat")
        u3d.write_dat_volume(path, data)
        # written as uint8 passthrough
        out, _, _ = u3d.read_dat_volume(path)
        assert out.max() <= 1.0
        np.testing.assert_allclose(out, data / 255.0, atol=1e-6)

    def test_basis_offset(self, tmp_path):
        data = np.zeros((2, 2, 2), np.float32)
        basis = np.diag([1.0, 2.0, 3.0]).astype(np.float32)
        offset = np.array([-0.5, -1.0, -1.5], np.float32)
        path = str(tmp_path / "vb.dat")
        u3d.write_dat_volume(path, data, basis=basis, offset=offset)
        _, b, o = u3d.read_dat_volume(path)
        np.testing.assert_allclose(b, basis)
        np.testing.assert_allclose(o, offset)
