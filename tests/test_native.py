"""Native C++ varlen packer vs pure-python fallback equivalence."""

import numpy as np
import pytest

from sageattention_tpu import native


@pytest.fixture(params=[True, False], ids=["native", "fallback"])
def backend(request, monkeypatch):
    if request.param and not native.HAVE_NATIVE:
        pytest.skip("native extension not built")
    if not request.param:
        monkeypatch.setattr(native, "_ext", None)
    return request.param


class TestPacker:
    def test_cu_seqlens(self, backend):
        np.testing.assert_array_equal(
            native.cu_seqlens([3, 0, 5]), [0, 3, 3, 8])

    def test_segment_ids_with_empty_and_pad(self, backend):
        cu = native.cu_seqlens([3, 0, 5, 2])
        seg = native.segment_ids(cu, 12)
        np.testing.assert_array_equal(
            seg, [0, 0, 0, 2, 2, 2, 2, 2, 3, 3, -1, -1])

    def test_pack_roundtrip(self, backend):
        lengths = np.array([2, 4, 1], np.int32)
        x = np.random.randn(3, 4, 8).astype(np.float32)
        packed = native.pack_padded(x, lengths)
        assert packed.shape == (7, 8)
        unpacked = native.unpack_to_padded(packed, lengths, 4)
        mask = (np.arange(4)[None, :] < lengths[:, None])[..., None]
        np.testing.assert_array_equal(unpacked, x * mask)

    def test_length_overflow_guard(self, backend):
        if backend:
            with pytest.raises(ValueError):
                native.pack_indices(np.array([5], np.int32), 3)


def test_native_matches_fallback():
    if not native.HAVE_NATIVE:
        pytest.skip("native extension not built")
    lengths = np.random.randint(0, 50, size=33).astype(np.int32)
    cu_n = native.cu_seqlens(lengths)
    seg_n = native.segment_ids(cu_n, int(cu_n[-1]) + 17)
    g_n, m_n = native.pack_indices(lengths, 50)
    ext = native._ext
    try:
        native._ext = None
        np.testing.assert_array_equal(cu_n, native.cu_seqlens(lengths))
        np.testing.assert_array_equal(
            seg_n, native.segment_ids(cu_n, int(cu_n[-1]) + 17))
        g_p, m_p = native.pack_indices(lengths, 50)
        np.testing.assert_array_equal(g_n, g_p)
        np.testing.assert_array_equal(m_n, m_p)
    finally:
        native._ext = ext
