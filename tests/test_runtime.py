"""Native IO runtime (C++ libsfio): decoders match the NumPy codecs."""

import numpy as np
import pytest

from streamflow_tpu import runtime
from streamflow_tpu.data import frame_utils


@pytest.fixture(scope="module")
def lib_ok():
    if runtime.get_lib() is None:
        pytest.skip("g++ unavailable; native runtime disabled")
    return True


def test_native_flo_roundtrip(lib_ok, tmp_path):
    rng = np.random.default_rng(0)
    fl = rng.standard_normal((30, 40, 2)).astype(np.float32)
    p = tmp_path / "a.flo"
    frame_utils.write_flo(p, fl)
    out = runtime.read_flo_native(str(p))
    np.testing.assert_array_equal(out, fl)


def test_native_flo_batch(lib_ok, tmp_path):
    rng = np.random.default_rng(1)
    flos, paths = [], []
    for i in range(8):
        fl = rng.standard_normal((12, 16, 2)).astype(np.float32)
        p = tmp_path / f"{i}.flo"
        frame_utils.write_flo(p, fl)
        flos.append(fl)
        paths.append(str(p))
    out = runtime.read_flo_batch_native(paths)
    np.testing.assert_array_equal(out, np.stack(flos))


def test_native_flo_rejects_garbage(lib_ok, tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"not a flow file")
    assert runtime.read_flo_native(str(p)) is None


def test_native_ppm(lib_ok, tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (21, 17, 3), dtype=np.uint8)
    p = tmp_path / "x.ppm"
    Image.fromarray(img).save(p)
    out = runtime.read_ppm_native(str(p))
    np.testing.assert_array_equal(out, img)
