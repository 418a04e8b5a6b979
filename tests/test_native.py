"""Native C++ golden verifier vs the NumPy golden model (bit-level twin)."""

import numpy as np
import pytest

from stencil_tpu.core.grid import DirichletBC
from stencil_tpu.core import spec as S
from stencil_tpu.native import available, golden_iterate_native
from stencil_tpu.ops import golden

pytestmark = pytest.mark.skipif(
    not available(), reason="no C++ toolchain for the native verifier"
)


@pytest.mark.parametrize("spec_name,shape", [
    ("jacobi5", (24, 40)),
    ("jacobi9", (24, 40)),
    ("star2d_r2", (24, 40)),
    ("laplace2d_ho", (24, 40)),
    ("jacobi7", (10, 12, 20)),
    ("jacobi27", (10, 12, 20)),
    ("laplace3d_ho", (10, 12, 20)),
])
def test_native_matches_numpy(rng, spec_name, shape):
    sp = S.get_spec(spec_name)
    x0 = rng.random(shape)
    a = golden.golden_iterate(x0, sp, 5)
    b = golden_iterate_native(x0, sp, 5)
    assert b is not None
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-13)


def test_native_custom_bc(rng):
    sp = S.jacobi5()
    bc = DirichletBC(values=((2.0, -3.0), (0.5, 7.0)))
    x0 = rng.random((16, 24))
    a = golden.golden_iterate(x0, sp, 4, bc=bc)
    b = golden_iterate_native(x0, sp, 4, bc=bc)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-13)


def test_native_multithreaded_deterministic(rng):
    sp = S.jacobi7_3d()
    x0 = rng.random((32, 16, 24))
    b1 = golden_iterate_native(x0, sp, 3, num_threads=1)
    b4 = golden_iterate_native(x0, sp, 3, num_threads=4)
    np.testing.assert_array_equal(b1, b4)


def test_native_zero_iterations(rng):
    sp = S.jacobi5()
    x0 = rng.random((8, 8))
    b = golden_iterate_native(x0, sp, 0)
    np.testing.assert_array_equal(b, x0)


def test_native_bmp_matches_python(tmp_path):
    """Native colorizer + BMP writer must be byte-identical to the Python
    implementations (same check the golden models get)."""
    import numpy as np
    import pytest

    from stencil_tpu import native
    from stencil_tpu.utils import image

    if native.load_bmp() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    vals = rng.uniform(-0.2, 1.2, size=(33, 47))  # odd sizes -> row padding
    rgb_py = image.colorize(vals)
    rgb_c = image.colorize_native(vals)
    np.testing.assert_array_equal(rgb_py, rgb_c)

    p_py = tmp_path / "py.bmp"
    p_c = tmp_path / "c.bmp"
    image.write_bmp(p_py, rgb_py)
    assert image.write_bmp_native(p_c, rgb_c)
    assert p_py.read_bytes() == p_c.read_bytes()


def test_dump_heatmap_roundtrip(tmp_path):
    import numpy as np

    from stencil_tpu.utils import image

    p = tmp_path / "h.bmp"
    image.dump_heatmap(p, np.linspace(0, 1, 64 * 32).reshape(64, 32))
    data = p.read_bytes()
    assert data[:2] == b"BM"
    assert len(data) == 14 + 40 + 64 * 32 * 3  # 32*3 divisible by 4
