"""GeoTIFF codec tests: round-trips and format-feature coverage via synthetic files."""

import struct
import zlib

import numpy as np
import pytest

from xdem_tpu import examples
from xdem_tpu.georef import Affine
from xdem_tpu.raster import Raster


class TestRoundTrip:
    def test_float32_roundtrip(self, tmp_path):
        ref = examples.get_ref_dem_test()
        arr = np.asarray(ref.data).copy()
        arr[5, 7] = np.nan
        r = Raster(arr, ref.transform, ref.crs)
        path = str(tmp_path / "test.tif")
        r.save(path)
        back = Raster.open(path)
        assert back.shape == r.shape
        assert back.crs == r.crs
        assert back.transform.almost_equals(r.transform, precision=1e-6)
        a, b = np.asarray(r.data), np.asarray(back.data)
        assert (np.isfinite(a) == np.isfinite(b)).all()
        both = np.isfinite(a)
        assert np.allclose(a[both], b[both], atol=0)

    def test_nodata_roundtrip(self, tmp_path):
        arr = np.array([[1.0, np.nan], [3.0, 4.0]], dtype=np.float32)
        r = Raster(arr, Affine.from_origin(0, 100, 10, 10), 32633)
        path = str(tmp_path / "nd.tif")
        r.save(path, nodata=-7777.0)
        back = Raster.open(path)
        assert np.isnan(np.asarray(back.data)[0, 1])
        assert back.nodata == -7777.0

    def test_geographic_crs(self, tmp_path):
        arr = np.ones((4, 5), dtype=np.float32)
        r = Raster(arr, Affine.from_origin(10.0, 50.0, 0.01, 0.01), 4326)
        path = str(tmp_path / "geo.tif")
        r.save(path)
        back = Raster.open(path)
        assert back.crs.epsg == 4326


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (MSB-first codes, early change) — independent oracle for
    the C++ decoder."""
    CLEAR, EOI = 256, 257
    codes = []  # (code, bit width)
    table = {bytes([i]): i for i in range(256)}
    next_code, bits = 258, 9
    codes.append((CLEAR, bits))
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        codes.append((table[w], bits))
        table[wc] = next_code
        next_code += 1
        # Widen once a code needing the next width exists (libtiff early-change pairing)
        if next_code == (1 << bits) and bits < 12:
            bits += 1
        if next_code == 4094:  # table nearly full: emit Clear and restart
            codes.append((CLEAR, bits))
            table = {bytes([i]): i for i in range(256)}
            next_code, bits = 258, 9
        w = bytes([ch])
    if w:
        codes.append((table[w], bits))
    codes.append((EOI, bits))
    out = bytearray()
    acc = nacc = 0
    for code, nb in codes:
        acc = (acc << nb) | code
        nacc += nb
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _fp_predict_row(row: bytes, n_samples: int, bps: int) -> bytes:
    """TIFF floating-point predictor (3) encoder for one row of native-LE samples:
    reorder into byte planes (MSB plane first), then byte-wise horizontal differencing."""
    a = np.frombuffer(row, np.uint8).reshape(n_samples, bps)
    planes = np.ascontiguousarray(a[:, ::-1].T).reshape(-1)
    diff = planes.copy()
    diff[1:] = planes[1:] - planes[:-1]
    return diff.tobytes()


def _hdiff_row(row: bytes, n_samples: int, bps: int, bo: str) -> bytes:
    """Horizontal differencing predictor (2) encoder for one row of integer samples."""
    kind = {1: "u1", 2: "u2", 4: "u4"}[bps]
    a = np.frombuffer(row, bo + kind).astype(np.int64)
    d = a.copy()
    d[1:] = a[1:] - a[:-1]
    return (d & ((1 << (8 * bps)) - 1)).astype(bo + kind).tobytes()


def _write_tiff(path, width, height, data_bytes, extra_tags=(), bits=32, fmt=3,
                compression=1, rows_per_strip=None, big_endian=False, predictor=None):
    """Hand-rolled minimal TIFF writer for exercising the reader's format coverage."""
    bo = ">" if big_endian else "<"
    rows_per_strip = rows_per_strip or height
    n_strips = (height + rows_per_strip - 1) // rows_per_strip
    bps = bits // 8
    row_bytes = width * bps
    strips = []
    for s in range(n_strips):
        rows = min(rows_per_strip, height - s * rows_per_strip)
        raw = data_bytes[s * rows_per_strip * row_bytes:(s * rows_per_strip + rows) * row_bytes]
        if predictor == 3:
            raw = b"".join(_fp_predict_row(raw[r * row_bytes:(r + 1) * row_bytes], width, bps)
                           for r in range(rows))
        elif predictor == 2:
            raw = b"".join(_hdiff_row(raw[r * row_bytes:(r + 1) * row_bytes], width, bps, bo)
                           for r in range(rows))
        if compression == 8:
            strips.append(zlib.compress(raw))
        elif compression == 5:
            strips.append(_lzw_encode(raw))
        else:
            strips.append(raw)

    tags = ([(317, 3, 1, predictor)] if predictor else []) + [
        (256, 4, 1, width),
        (257, 4, 1, height),
        (258, 3, 1, bits),
        (259, 3, 1, compression),
        (262, 3, 1, 1),
        (277, 3, 1, 1),
        (278, 4, 1, rows_per_strip),
        (339, 3, 1, fmt),
    ] + list(extra_tags)

    # strip offsets/counts: may need external payloads
    ifd_entries = len(tags) + 2
    ifd_size = 2 + ifd_entries * 12 + 4
    payload_start = 8 + ifd_size
    ext = b""

    def add_payload(b):
        nonlocal ext
        off = payload_start + len(ext)
        ext += b
        return off

    strip_offsets = []
    cursor = None
    counts = [len(s) for s in strips]
    # allocate payloads for offsets/counts arrays if needed
    if n_strips == 1:
        off_val = None  # patched after ext known
        cnt_val = counts[0]
    else:
        pass

    # Simple approach: compute strip data start after payloads
    entries = []
    for (tag, typ, cnt, val) in tags:
        entries.append((tag, typ, cnt, val))

    if n_strips > 1:
        off_payload_pos = add_payload(b"\0" * (4 * n_strips))
        cnt_payload = add_payload(b"".join(struct.pack(bo + "I", c) for c in counts))
        entries.append((273, 4, n_strips, off_payload_pos))
        entries.append((279, 4, n_strips, cnt_payload))
    else:
        entries.append((273, 4, 1, 0))  # patched below
        entries.append((279, 4, 1, counts[0]))

    data_start = payload_start + len(ext)
    offs = []
    cur = data_start
    for s in strips:
        offs.append(cur)
        cur += len(s)
    if n_strips > 1:
        ext = ext[:off_payload_pos - payload_start] + b"".join(
            struct.pack(bo + "I", o) for o in offs) + ext[off_payload_pos - payload_start + 4 * n_strips:]
    else:
        entries = [(t, ty, c, offs[0] if t == 273 else v) for (t, ty, c, v) in entries]

    entries.sort(key=lambda e: e[0])
    out = bytearray()
    out += (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
    out += struct.pack(bo + "I", 8)
    out += struct.pack(bo + "H", len(entries))
    for (tag, typ, cnt, val) in entries:
        out += struct.pack(bo + "HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            out += struct.pack(bo + "HH", val, 0)
        else:
            out += struct.pack(bo + "I", val)
    out += struct.pack(bo + "I", 0)
    out += ext
    for s in strips:
        out += s
    with open(path, "wb") as f:
        f.write(bytes(out))


class TestFormatCoverage:
    @pytest.mark.parametrize("compression", [1, 8])
    @pytest.mark.parametrize("rows_per_strip", [None, 3])
    def test_float_strips(self, tmp_path, compression, rows_per_strip):
        h, w = (7, 5)
        data = np.arange(h * w, dtype=np.float32).reshape(h, w) * 1.5
        path = str(tmp_path / "t.tif")
        _write_tiff(path, w, h, data.tobytes(), compression=compression, rows_per_strip=rows_per_strip)
        back = Raster.open(path)
        assert np.allclose(np.asarray(back.data), data)

    @pytest.mark.parametrize("dtype,bits,fmt", [
        (np.uint8, 8, 1), (np.uint16, 16, 1), (np.int16, 16, 2), (np.int32, 32, 2),
        (np.float64, 64, 3),
    ])
    def test_sample_formats(self, tmp_path, dtype, bits, fmt):
        h, w = (4, 6)
        data = (np.arange(h * w).reshape(h, w) - 5).astype(dtype)
        path = str(tmp_path / "t.tif")
        _write_tiff(path, w, h, data.tobytes(), bits=bits, fmt=fmt)
        back = Raster.open(path)
        assert np.allclose(np.asarray(back.data), data.astype(np.float32))

    @pytest.mark.parametrize("rows_per_strip", [None, 3])
    def test_lzw_float_strips(self, tmp_path, rows_per_strip):
        h, w = (9, 7)
        rng = np.random.default_rng(7)
        # Repetitive data (quantized) exercises long LZW dictionary chains incl. KwKwK
        data = np.round(rng.normal(0, 3, (h, w))).astype(np.float32)
        path = str(tmp_path / "lzw.tif")
        _write_tiff(path, w, h, data.tobytes(), compression=5, rows_per_strip=rows_per_strip)
        back = Raster.open(path)
        assert np.allclose(np.asarray(back.data), data)

    def test_lzw_long_stream_dictionary_growth(self, tmp_path):
        # > 4094 dictionary entries forces width growth through 10/11/12 bits and a
        # mid-stream Clear; a varied-but-repetitive pattern grows the table quickly.
        h, w = (64, 256)
        base = np.arange(w, dtype=np.float32)
        data = np.stack([np.roll(base, i) + (i % 7) for i in range(h)]).astype(np.float32)
        path = str(tmp_path / "big_lzw.tif")
        _write_tiff(path, w, h, data.tobytes(), compression=5)
        back = Raster.open(path)
        assert np.array_equal(np.asarray(back.data), data)

    @pytest.mark.parametrize("compression", [5, 8])
    def test_float_predictor(self, tmp_path, compression):
        # GDAL's common creation profile for float DEMs: COMPRESS=DEFLATE/LZW PREDICTOR=3
        h, w = (11, 6)
        rng = np.random.default_rng(11)
        data = rng.normal(500, 80, (h, w)).astype(np.float32)
        path = str(tmp_path / "fp.tif")
        _write_tiff(path, w, h, data.tobytes(), compression=compression, predictor=3,
                    rows_per_strip=4)
        back = Raster.open(path)
        assert np.array_equal(np.asarray(back.data), data)

    def test_float_predictor_float64_big_endian(self, tmp_path):
        # Predictor-3 byte planes are endianness-independent (most-significant plane first)
        h, w = (5, 4)
        data = (np.arange(h * w, dtype=np.float64).reshape(h, w) * np.pi)
        path = str(tmp_path / "fp64.tif")
        _write_tiff(path, w, h, data.tobytes(), bits=64, fmt=3, compression=8, predictor=3,
                    big_endian=True)
        back = Raster.open(path)
        assert np.allclose(np.asarray(back.data), data.astype(np.float32))

    @pytest.mark.parametrize("dtype,bits,fmt", [(np.uint16, 16, 1), (np.int32, 32, 2)])
    def test_lzw_horizontal_predictor_ints(self, tmp_path, dtype, bits, fmt):
        h, w = (6, 9)
        data = (np.arange(h * w).reshape(h, w) * 3 - 11).astype(dtype)
        path = str(tmp_path / "hd.tif")
        _write_tiff(path, w, h, data.tobytes(), bits=bits, fmt=fmt, compression=5, predictor=2)
        back = Raster.open(path)
        assert np.array_equal(np.asarray(back.data), data.astype(np.float32))

    def test_write_predictor3_smaller_and_exact(self, tmp_path):
        from xdem_tpu.io import write_raster

        rng = np.random.default_rng(4)
        from scipy.ndimage import gaussian_filter

        arr = gaussian_filter(rng.normal(500, 80, (200, 300)), 3).astype(np.float32)
        r = Raster(arr, Affine(10.0, 0, 0, 0, -10.0, 2000.0), 32633)
        import os

        p3, p1 = str(tmp_path / "p3.tif"), str(tmp_path / "p1.tif")
        write_raster(p3, r, predictor=3)
        write_raster(p1, r, predictor=1)
        assert os.path.getsize(p3) < 0.8 * os.path.getsize(p1)  # real compression win
        np.testing.assert_array_equal(np.asarray(Raster.open(p3).data), arr)
        # External readers (libtiff via Pillow) decode the predictor-3 output
        Image = pytest.importorskip("PIL.Image")
        np.testing.assert_array_equal(np.array(Image.open(p3)), arr)

    def test_lzw_against_libtiff_stream(self, tmp_path):
        # Independent oracle: Pillow writes LZW through libtiff, pinning the real-world
        # early-change convention (widths widen at decoder entries 511/1023/2047).
        Image = pytest.importorskip("PIL.Image")
        from xdem_tpu.io import read_raster

        data = (np.arange(97 * 53, dtype=np.float32).reshape(97, 53) * 0.5)
        path = str(tmp_path / "libtiff_lzw.tif")
        Image.fromarray(data, mode="F").save(path, compression="tiff_lzw")
        r = read_raster(path)
        assert np.array_equal(np.asarray(r.data), data)

    def test_reader_rejects_bad_file(self, tmp_path):
        path = str(tmp_path / "bad.tif")
        with open(path, "wb") as f:
            f.write(b"NOT A TIFF AT ALL")
        with pytest.raises(OSError, match="not a TIFF"):
            Raster.open(path)

    def test_fuzzed_headers_never_crash(self, tmp_path):
        """Random mutations of valid files must fail cleanly (OSError), not segfault the
        process — exercises the 64-bit overflow guards in the native parser."""
        from xdem_tpu.io import read_raster

        rng = np.random.default_rng(123)
        data = np.arange(48, dtype=np.float32).reshape(6, 8)
        base_classic = str(tmp_path / "c.tif")
        _write_tiff(base_classic, 8, 6, data.tobytes(), compression=5)
        from xdem_tpu.georef import Affine
        from xdem_tpu.io import StreamingRasterWriter

        base_big = str(tmp_path / "b.tif")
        with StreamingRasterWriter(base_big, (6, 8), Affine.identity(), bigtiff=True) as w:
            w.write_rows(0, data)
        for src in (base_classic, base_big):
            raw = np.frombuffer(open(src, "rb").read(), np.uint8).copy()
            for trial in range(150):
                mutated = raw.copy()
                # Corrupt 1-8 bytes in the header/IFD region (first 400 bytes)
                idx = rng.integers(0, min(400, len(mutated)), rng.integers(1, 9))
                mutated[idx] = rng.integers(0, 256, len(idx))
                p = str(tmp_path / "fz.tif")
                with open(p, "wb") as f:
                    f.write(mutated.tobytes())
                try:
                    read_raster(p)  # either decodes or raises cleanly
                except (OSError, ValueError):
                    pass

    def test_dem_from_file_keeps_vcrs_workflow(self, tmp_path):
        from xdem_tpu.dem import DEM

        ref = examples.get_ref_dem_test()
        path = str(tmp_path / "dem.tif")
        ref.save(path)
        dem = DEM.open(path)
        # Raster.open returns the calling class
        slope = dem.slope() if isinstance(dem, DEM) else None
        assert slope is not None


class TestStreamingIO:
    def test_out_of_order_writes_roundtrip(self, tmp_path):
        from xdem_tpu.georef import Affine
        from xdem_tpu.io import StreamingRasterWriter, read_raster, read_rows

        rng = np.random.default_rng(3)
        a = rng.normal(0, 10, (100, 37)).astype(np.float32)
        a[3, 5] = np.nan
        p = str(tmp_path / "s.tif")
        t = Affine(5.0, 0.0, 100.0, 0.0, -5.0, 900.0)
        with StreamingRasterWriter(p, a.shape, t, crs=32633, rows_per_strip=16) as w:
            # Bands arrive out of order
            for r0 in (60, 0, 30, 90):
                w.write_rows(r0, a[r0: r0 + 30])
        back = read_rows(p, 0, 100)
        np.testing.assert_allclose(np.nan_to_num(back), np.nan_to_num(a))
        assert np.isnan(back[3, 5])
        # The native C++ codec reads the streamed file identically
        r = read_raster(p)
        assert r.crs.epsg == 32633 and tuple(r.transform) == tuple(t)
        np.testing.assert_allclose(np.nan_to_num(np.asarray(r.data)), np.nan_to_num(a))

    def test_window_read_crossing_strips(self, tmp_path):
        from xdem_tpu.georef import Affine
        from xdem_tpu.io import StreamingRasterWriter, read_rows

        a = np.arange(64 * 20, dtype=np.float32).reshape(64, 20)
        p = str(tmp_path / "w.tif")
        with StreamingRasterWriter(p, a.shape, Affine.identity(), rows_per_strip=16) as w:
            w.write_rows(0, a)
        got = read_rows(p, 10, 40)  # spans strips 0..3
        np.testing.assert_array_equal(got, a[10:50])
        # Clamped at the end
        got = read_rows(p, 60, 100)
        np.testing.assert_array_equal(got, a[60:])

    def test_bigtiff_roundtrip_both_readers(self, tmp_path):
        from xdem_tpu.georef import Affine
        from xdem_tpu.io import StreamingRasterWriter, read_raster, read_rows

        rng = np.random.default_rng(5)
        a = rng.normal(100, 10, (50, 23)).astype(np.float32)
        a[7, 2] = np.nan
        p = str(tmp_path / "big.tif")
        t = Affine(2.0, 0.0, 10.0, 0.0, -2.0, 500.0)
        with StreamingRasterWriter(p, a.shape, t, crs=32633, rows_per_strip=16,
                                   bigtiff=True) as w:
            for r0 in (16, 0, 32, 48):
                w.write_rows(r0, a[r0: r0 + 16])
        with open(p, "rb") as f:
            assert f.read(4) == b"II+\x00"  # really a BigTIFF
        back = read_rows(p, 0, 50)
        np.testing.assert_allclose(np.nan_to_num(back), np.nan_to_num(a))
        assert np.isnan(back[7, 2])
        # Windowed read crossing strips
        np.testing.assert_allclose(np.nan_to_num(read_rows(p, 10, 30)),
                                   np.nan_to_num(a[10:40]))
        # The native C++ codec reads BigTIFF too, with georeferencing intact
        r = read_raster(p)
        assert r.crs.epsg == 32633 and tuple(r.transform) == tuple(t)
        np.testing.assert_allclose(np.nan_to_num(np.asarray(r.data)), np.nan_to_num(a))

    def test_bigtiff_auto_threshold(self, tmp_path):
        from xdem_tpu.georef import Affine
        from xdem_tpu.io import StreamingRasterWriter

        small = StreamingRasterWriter(str(tmp_path / "s.tif"), (4, 4), Affine.identity())
        small.close()
        assert not small.bigtiff  # tiny rasters stay classic TIFF

    def test_compressed_file_rejected_for_windowed_reads(self, tmp_path):
        from xdem_tpu.georef import Affine
        from xdem_tpu.io import read_rows, write_raster
        from xdem_tpu.raster import Raster

        r = Raster(np.ones((20, 20), np.float32), Affine.identity(), 32633)
        p = str(tmp_path / "c.tif")
        write_raster(p, r)  # DEFLATE-compressed by the native codec
        with pytest.raises(OSError, match="uncompressed|missing TIFF tag"):
            read_rows(p, 0, 5)


def _write_las(path, x, y, z, epsg=None, version=(1, 2), point_format=0):
    """Minimal LAS writer for exercising read_epc's LAS path."""
    import struct

    x = np.asarray(x, np.float64)
    n = len(x)
    scale = (0.001, 0.001, 0.001)
    off = (float(np.floor(x.min())), float(np.floor(np.asarray(y).min())),
           float(np.floor(np.asarray(z).min())))
    header_size = 227 if version[1] < 3 else 375
    vlr = b""
    if epsg is not None:
        keys = struct.pack("<16H",
                           1, 1, 0, 3,
                           1024, 0, 1, 1,       # ModelTypeProjected
                           3072, 0, 1, epsg,    # ProjectedCSType
                           4099, 0, 1, 9001)    # VerticalUnits (filler key)
        vlr = (struct.pack("<H", 0) + b"LASF_Projection".ljust(16, b"\x00")
               + struct.pack("<HH", 34735, len(keys)) + b"\x00" * 32 + keys)
    point_offset = header_size + len(vlr)
    point_len = 20
    hdr = bytearray(header_size)
    hdr[0:4] = b"LASF"
    hdr[24] = version[0]
    hdr[25] = version[1]
    struct.pack_into("<H", hdr, 94, header_size)
    struct.pack_into("<I", hdr, 96, point_offset)
    struct.pack_into("<I", hdr, 100, 1 if vlr else 0)
    hdr[104] = point_format
    struct.pack_into("<H", hdr, 105, point_len)
    struct.pack_into("<I", hdr, 107, n if version[1] < 4 else 0)
    struct.pack_into("<6d", hdr, 131, *scale, *off)
    if version[1] >= 4:
        struct.pack_into("<Q", hdr, 247, n)
    pts = bytearray()
    for xi, yi, zi in zip(x, np.asarray(y, np.float64), np.asarray(z, np.float64)):
        pts += struct.pack("<3i", round((xi - off[0]) / scale[0]),
                           round((yi - off[1]) / scale[1]), round((zi - off[2]) / scale[2]))
        pts += b"\x00" * (point_len - 12)
    with open(path, "wb") as f:
        f.write(bytes(hdr) + vlr + bytes(pts))


class TestEPCFormats:
    def _pts(self):
        rng = np.random.default_rng(9)
        x = 5e5 + rng.uniform(0, 1000, 40)
        y = 8.8e6 + rng.uniform(0, 1000, 40)
        z = rng.uniform(100, 500, 40)
        return x, y, z

    @pytest.mark.parametrize("version", [(1, 2), (1, 4)])
    def test_las_roundtrip_with_geokey_epsg(self, tmp_path, version):
        from xdem_tpu.epc import read_epc

        x, y, z = self._pts()
        p = str(tmp_path / "p.las")
        _write_las(p, x, y, z, epsg=32633, version=version)
        epc = read_epc(p)
        assert epc.crs.epsg == 32633
        np.testing.assert_allclose(epc.x, x, atol=1e-3)
        np.testing.assert_allclose(epc.y, y, atol=1e-3)
        np.testing.assert_allclose(epc.z, z, atol=1e-3)

    def test_write_epc_las_roundtrip(self, tmp_path):
        """Our own LAS writer (write_epc .las) round-trips points + EPSG through read_epc."""
        from xdem_tpu.epc import EPC, read_epc, write_epc

        x, y, z = self._pts()
        epc = EPC(x=x, y=y, z=z, crs=32633)
        p = str(tmp_path / "w.las")
        write_epc(p, epc)
        back = read_epc(p)
        assert back.crs.epsg == 32633
        np.testing.assert_allclose(back.x, x, atol=1e-3)
        np.testing.assert_allclose(back.y, y, atol=1e-3)
        np.testing.assert_allclose(back.z, z, atol=1e-3)

    def test_write_epc_las_geographic_and_wide_extents(self, tmp_path):
        """Geographic LAS gets 1e-7-deg horizontal scale; axes whose span would overflow
        int32 coarsen by decades instead of wrapping (±180 deg of longitude)."""
        from xdem_tpu.epc import EPC, read_epc, write_epc

        rng = np.random.default_rng(5)
        x = rng.uniform(-180, 180, 60)
        y = rng.uniform(-89, 89, 60)
        z = rng.uniform(-100, 8000, 60)
        p = str(tmp_path / "g.las")
        write_epc(p, EPC(x=x, y=y, z=z, crs=4326))
        back = read_epc(p)
        assert back.crs.epsg == 4326
        np.testing.assert_allclose(back.x, x, atol=1e-6)
        np.testing.assert_allclose(back.y, y, atol=1e-7)
        np.testing.assert_allclose(back.z, z, atol=1e-3)

    def test_write_epc_las_requires_epsg(self, tmp_path):
        from xdem_tpu.epc import EPC, write_epc
        from xdem_tpu.georef import CRS

        epc = EPC(x=[0.0], y=[0.0], z=[1.0],
                  crs=CRS("+proj=tmerc +lat_0=0 +lon_0=10.5 +k=1 +x_0=0 +y_0=0 +ellps=WGS84"))
        if epc.crs.epsg:  # definition-based CRS matching may identify an EPSG; skip then
            pytest.skip("proj-string resolved to an EPSG code")
        with pytest.raises(ValueError, match="EPSG"):
            write_epc(str(tmp_path / "x.las"), epc)

    def test_las_fuzzed_headers_fail_cleanly(self, tmp_path):
        """Mutated LAS headers must raise (OSError/ValueError) or parse, never crash or
        hang — same discipline as the GeoTIFF codec fuzz test. Guards the header-size,
        point-count and VLR-walk bounds checks in _read_las."""
        from xdem_tpu.epc import EPC, read_epc, write_epc

        x, y, z = self._pts()
        p = str(tmp_path / "fuzz.las")
        write_epc(p, EPC(x=x, y=y, z=z, crs=32633))
        raw = np.frombuffer(open(p, "rb").read(), np.uint8).copy()
        rng = np.random.default_rng(7)
        mut_path = str(tmp_path / "mut.las")
        for trial in range(150):
            mutated = raw.copy()
            n_flips = int(rng.integers(1, 9))
            # Corrupt header + VLR region (first 300 bytes), keeping the LASF signature
            idx = rng.integers(4, min(300, len(mutated)), n_flips)
            mutated[idx] = rng.integers(0, 256, n_flips).astype(np.uint8)
            open(mut_path, "wb").write(mutated.tobytes())
            try:
                epc = read_epc(mut_path, crs=32633)
                assert len(epc) <= len(x)  # parsed: point count must stay in-file bounds
            except (OSError, ValueError):
                pass  # clean rejection

    def test_las_truncated_point_data(self, tmp_path):
        from xdem_tpu.epc import EPC, read_epc, write_epc

        x, y, z = self._pts()
        p = str(tmp_path / "t.las")
        write_epc(p, EPC(x=x, y=y, z=z, crs=32633))
        raw = open(p, "rb").read()
        open(p, "wb").write(raw[: len(raw) - 100])
        with pytest.raises(OSError, match="truncated"):
            read_epc(p)

    def test_las_without_crs_requires_kwarg(self, tmp_path):
        from xdem_tpu.epc import read_epc

        x, y, z = self._pts()
        p = str(tmp_path / "nocrs.las")
        _write_las(p, x, y, z, epsg=None)
        with pytest.raises(ValueError, match="crs"):
            read_epc(p)
        epc = read_epc(p, crs=32633)
        assert epc.crs.epsg == 32633

    @pytest.mark.parametrize("ext", ["csv", "xyz"])
    def test_text_roundtrip(self, tmp_path, ext):
        from xdem_tpu.epc import read_epc, write_epc

        x, y, z = self._pts()
        from xdem_tpu.epc import EPC

        src = EPC(x=x, y=y, z=z, crs=32633)
        p = str(tmp_path / f"p.{ext}")
        write_epc(p, src)
        back = read_epc(p, crs=32633)
        np.testing.assert_allclose(back.x, x, rtol=1e-8)
        np.testing.assert_allclose(back.z, z, rtol=1e-8)

    def test_text_scientific_notation_first_row_kept(self, tmp_path):
        # np.savetxt's default '%.18e' format must not be mistaken for a header row
        from xdem_tpu.epc import read_epc

        p = str(tmp_path / "sci.xyz")
        np.savetxt(p, np.array([[1.5, 2.5, 3.5], [4.5, 5.5, 6.5]]))
        epc = read_epc(p, crs=32633)
        assert epc.point_count == 2
        assert epc.z.tolist() == [3.5, 6.5]

    def test_npz_write_requires_epsg(self, tmp_path):
        from xdem_tpu.epc import EPC, write_epc

        epc = EPC(x=[0.0], y=[0.0], z=[1.0], crs=32633)
        epc.crs._epsg = None  # simulate a free-form CRS with no EPSG
        with pytest.raises(ValueError, match="EPSG"):
            write_epc(str(tmp_path / "x.npz"), epc)

    def test_laz_rejected(self, tmp_path):
        from xdem_tpu.epc import read_epc

        p = str(tmp_path / "c.laz")
        open(p, "wb").close()
        with pytest.raises(OSError, match="LAZ"):
            read_epc(p)


class TestMetadataTags:
    def test_tags_roundtrip(self, tmp_path):
        from xdem_tpu.georef import Affine
        from xdem_tpu.io import read_raster
        from xdem_tpu.raster import Raster

        r = Raster(np.ones((20, 30), np.float32), Affine(10.0, 0, 0, 0, -10.0, 200.0), 32633)
        r.tags["PRODUCT"] = "COPDEM"
        p = str(tmp_path / "t.tif")
        r.save(p)
        back = read_raster(p)
        assert back.tags["PRODUCT"] == "COPDEM"

    def test_dem_vcrs_persists_through_file(self, tmp_path):
        from xdem_tpu.dem import DEM
        from xdem_tpu.georef import Affine

        dem = DEM(np.ones((10, 10), np.float32), Affine(10.0, 0, 0, 0, -10.0, 100.0), 32633)
        dem.set_vcrs("EGM96")
        p = str(tmp_path / "d.tif")
        dem.save(p)
        back = DEM.open(p)
        assert back.vcrs_name == "EGM96"

    def test_product_tag_sets_vcrs_on_open(self, tmp_path):
        from xdem_tpu.dem import DEM
        from xdem_tpu.georef import Affine
        from xdem_tpu.raster import Raster

        r = Raster(np.ones((10, 10), np.float32), Affine(10.0, 0, 0, 0, -10.0, 100.0), 32633)
        r.tags["PRODUCT"] = "COPDEM"
        p = str(tmp_path / "c.tif")
        r.save(p)
        dem = DEM.open(p)
        assert dem.vcrs_name == "EGM08"  # COPDEM -> EGM08 (reference vcrs table)


class TestCitationWkt:
    """CRSs without an EPSG code persist through GeoTIFF as citation WKT
    (user-defined CS geokey 32767 + GTCitation in GeoAsciiParams, the GDAL convention)."""

    def _crs(self):
        from xdem_tpu.georef import CRS

        return CRS("+proj=tmerc +lat_0=0 +lon_0=27 +k=0.9996 +x_0=500000 +y_0=0 +ellps=GRS80")

    def test_codec_roundtrip(self, tmp_path):
        from xdem_tpu.georef import Affine
        from xdem_tpu.io import read_raster
        from xdem_tpu.raster import Raster

        crs = self._crs()
        p = str(tmp_path / "cit.tif")
        Raster(np.ones((6, 7), np.float32), Affine.from_origin(0, 60, 10, 10), crs).save(p)
        back = read_raster(p)
        assert back.crs.epsg is None
        assert back.crs == crs

    def test_codec_roundtrip_geographic(self, tmp_path):
        from xdem_tpu.georef import CRS, Affine
        from xdem_tpu.io import read_raster
        from xdem_tpu.raster import Raster

        g = CRS("+proj=longlat +ellps=intl +towgs84=-87,-98,-121")
        p = str(tmp_path / "geo.tif")
        Raster(np.ones((4, 4), np.float32), Affine.from_origin(5, 50, 0.01, 0.01), g).save(p)
        assert read_raster(p).crs == g

    def test_streaming_writer_roundtrip(self, tmp_path):
        from xdem_tpu.georef import Affine
        from xdem_tpu.io import StreamingRasterWriter, read_raster, read_rows

        crs = self._crs()
        p = str(tmp_path / "strm.tif")
        with StreamingRasterWriter(p, (10, 12), Affine.from_origin(0, 60, 10, 10), crs=crs) as w:
            w.write_rows(0, np.full((10, 12), 3.0, np.float32))
        assert read_raster(p).crs == crs
        np.testing.assert_allclose(read_rows(p, 2, 4), 3.0)  # pixel path still intact

    def test_epsg_still_wins(self, tmp_path):
        from xdem_tpu.georef import CRS, Affine
        from xdem_tpu.io import read_raster
        from xdem_tpu.raster import Raster

        p = str(tmp_path / "e.tif")
        Raster(np.ones((3, 3), np.float32), Affine.from_origin(0, 30, 10, 10), 2154).save(p)
        back = read_raster(p)
        assert back.crs.epsg == 2154 and back.crs == CRS(2154)


class TestParameterGeoKeys:
    """User-defined projection GeoKeys (ProjCoordTransGeoKey 3075 + parameter doubles) —
    the GDAL encoding for custom CRSs when no citation WKT is trusted/present. The reference
    ingests these via rasterio/pyproj (/root/reference/xdem/dem.py:150-173); the codec writes
    them alongside the citation and resolves them on read when the citation is absent."""

    _LCC = "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96 +x_0=100000 +y_0=50000 +datum=NAD27"

    def _params_only_file(self, tmp_path, keys, name="params.tif"):
        """Write a GeoTIFF carrying ONLY parameter GeoKeys (no citation WKT) — the shape of
        a GDAL export of a custom CRS whose citation a reader ignores."""
        import ctypes

        from xdem_tpu import io as xio
        from xdem_tpu.georef import Affine

        p = str(tmp_path / name)
        data = np.arange(20, dtype=np.float32).reshape(4, 5)
        tr = (ctypes.c_double * 6)(*[float(v) for v in tuple(Affine.from_origin(2e5, 1e6, 30, 30))])
        rc = xio._lib().gt_write(
            p.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 4, 5, tr,
            0, -9999.0, 1, b"", 3, b"", 0, xio._serialize_geokeys(keys),
        )
        assert rc == 0, xio._err()
        return p

    def test_written_files_carry_parameter_geokeys(self, tmp_path):
        from xdem_tpu import io as xio
        from xdem_tpu.georef import CRS, Affine
        from xdem_tpu.raster import Raster

        p = str(tmp_path / "lcc.tif")
        Raster(np.ones((3, 4), np.float32), Affine.from_origin(2e5, 1e6, 30, 30),
               CRS(self._LCC)).save(p)
        keys = xio._parse_geokeys(xio._lib().gt_geokeys(p.encode()).decode())
        assert keys[3075] == 8  # CT_LambertConfConic_2SP
        assert keys[3072] == 32767 and keys[2048] == 32767
        assert keys[3078] == (33.0,) and keys[3079] == (45.0,)
        assert keys[3084] == (-96.0,) and keys[3085] == (39.0,)
        assert keys[3086] == (100000.0,) and keys[3087] == (50000.0,)
        assert keys[2056] == 7008  # Clarke 1866
        assert keys[2062][:3] == (-8.0, 160.0, 176.0)  # NAD27 Helmert

    def test_geokeys_only_file_resolves_and_reprojects_like_its_twin(self, tmp_path):
        from xdem_tpu import io as xio
        from xdem_tpu.georef import CRS
        from xdem_tpu.raster import Raster

        crs = CRS(self._LCC)
        keys = __import__("xdem_tpu.projections", fromlist=["x"]).geokeys_from_projdef(
            crs.projdef)
        keys[3072] = 32767
        p = self._params_only_file(tmp_path, keys)
        back = xio.read_raster(p)
        assert back.crs == crs  # definition-based equality: GeoKeys == proj-string twin
        # Reprojection through the GeoKey-resolved CRS matches the proj-string twin exactly
        twin = Raster(back.data, back.transform, crs)
        a = np.asarray(back.reproject(crs=4326, res=0.001).data)
        b = np.asarray(twin.reproject(crs=4326, res=0.001).data)
        np.testing.assert_array_equal(a, b)

    def test_geokeys_roundtrip_all_supported_methods(self, tmp_path):
        """Every projdef family with a GeoTIFF CT code survives geokeys write->read exactly."""
        from xdem_tpu.projections import (
            geokeys_from_projdef, normalize_def, parse_projstring, projdef_from_geokeys,
        )

        strings = [
            "+proj=tmerc +lat_0=0 +lon_0=27 +k=0.9996 +x_0=500000 +y_0=0 +ellps=GRS80",
            "+proj=merc +lon_0=110 +lat_ts=5 +x_0=1000 +y_0=2000 +ellps=WGS84",
            "+proj=lcc +lat_1=49 +lat_2=77 +lat_0=49 +lon_0=-95 +x_0=0 +y_0=0 +ellps=GRS80",
            "+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=2.337229 +k_0=0.99987742 "
            "+x_0=600000 +y_0=2200000 +ellps=clrk80ign",
            "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +ellps=GRS80",
            "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80",
            "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 +ellps=WGS84",
            "+proj=sterea +lat_0=52.1561606 +lon_0=5.3876389 +k=0.9999079 "
            "+x_0=155000 +y_0=463000 +ellps=bessel",
            "+proj=eqc +lat_ts=30 +lon_0=15 +ellps=WGS84",
            "+proj=cea +lat_ts=30 +lon_0=0 +ellps=WGS84",
            "+proj=somerc +lat_0=46.9524056 +lon_0=7.4395833 +k_0=1 "
            "+x_0=2600000 +y_0=1200000 +ellps=bessel",
        ]
        for s in strings:
            p1 = normalize_def(parse_projstring(s))
            keys = geokeys_from_projdef(p1)
            assert keys, s
            p2 = projdef_from_geokeys(keys)
            assert p1["proj"] == p2["proj"], s
            for k in ("a", "f", "lat_0", "lon_0", "lat_1", "lat_2", "lat_ts", "k_0",
                      "x_0", "y_0", "to_meter"):
                if k in p1:
                    assert abs(p1[k] - p2.get(k, np.nan)) < 1e-9, (s, k, p1.get(k), p2.get(k))

    def test_polar_stereographic_gdal_geokey_convention(self):
        """GDAL writes the STANDARD PARALLEL into ProjNatOriginLatGeoKey 3081 for
        CT_PolarStereographic (variant B, lat_0=+-90 implied by its sign); +-90 in 3081 is
        variant A with the scale in 3092. Our legacy explicit 3078 is still honored."""
        from xdem_tpu.projections import projdef_from_geokeys

        base = {1024: 1, 2048: 4326, 3072: 32767, 3075: 15}
        # GDAL variant B, north (e.g. NSIDC-style lat_ts=70, lon_0=-45)
        p = projdef_from_geokeys({**base, 3081: (70.0,), 3095: (-45.0,)})
        assert p["lat_0"] == 90.0 and p["lat_ts"] == 70.0 and p["lon_0"] == -45.0
        # GDAL variant B, south (EPSG:3031-style lat_ts=-71)
        p = projdef_from_geokeys({**base, 3081: (-71.0,), 3095: (0.0,)})
        assert p["lat_0"] == -90.0 and p["lat_ts"] == -71.0
        # Variant A: the pole in 3081, scale in 3092
        p = projdef_from_geokeys({**base, 3081: (90.0,), 3095: (0.0,), 3092: (0.994,)})
        assert p["lat_0"] == 90.0 and p.get("k_0") == 0.994 and "lat_ts" not in p
        # Legacy explicit ProjStdParallel1 still wins as lat_ts
        p = projdef_from_geokeys({**base, 3081: (90.0,), 3078: (70.0,), 3095: (-45.0,)})
        assert p["lat_0"] == 90.0 and p["lat_ts"] == 70.0

    def test_unsupported_ct_code_warns_not_silent(self, tmp_path):
        from xdem_tpu import io as xio

        # CT 26 = NewZealandMapGrid: no kernel — must WARN and fall back, never silently 4326
        p = self._params_only_file(tmp_path, {1024: 1, 2048: 4326, 3072: 32767, 3075: 26})
        with pytest.warns(UserWarning, match="could not be resolved"):
            back = xio.read_raster(p)
        assert back.crs.epsg == 4326

    def test_bare_user_defined_crs_warns_not_silent(self, tmp_path):
        from xdem_tpu import io as xio

        # ProjectedCSType 32767 with NO citation and NO parameter keys: nothing to resolve,
        # but assuming 4326 silently would be wrong — it must warn.
        p = self._params_only_file(tmp_path, {1024: 1, 3072: 32767})
        with pytest.warns(UserWarning, match="could not be resolved"):
            back = xio.read_raster(p)
        assert back.crs.epsg == 4326

    def test_us_survey_feet_units(self, tmp_path):
        from xdem_tpu import io as xio
        from xdem_tpu.georef import CRS

        # A state-plane-style LCC in US survey feet (unit geokey 9003)
        keys = {
            1024: 1, 2048: 4326, 3072: 32767, 3075: 8, 3076: 9003,
            3078: (34.0,), 3079: (36.1666,), 3084: (-86.0,), 3085: (33.75,),
            3086: (1968500.0,), 3087: (0.0,),
        }
        p = self._params_only_file(tmp_path, keys)
        back = xio.read_raster(p)
        assert back.crs.projdef["to_meter"] == pytest.approx(1200.0 / 3937.0)
        assert back.crs.is_projected

    def test_geographic_model_geokeys(self, tmp_path):
        from xdem_tpu import io as xio
        from xdem_tpu.georef import CRS

        # Geographic CRS on a legacy datum expressed purely as GeoKeys
        keys = {1024: 2, 2048: 32767, 2056: 7022, 2062: (-87.0, -98.0, -121.0)}
        p = self._params_only_file(tmp_path, keys)
        back = xio.read_raster(p)
        assert back.crs == CRS("+proj=longlat +ellps=intl +towgs84=-87,-98,-121")


class TestSubstrateReviewRegressions:
    """Round-3 substrate review: masked arrays, pixel interpretation, vector CRS, escaping."""

    def test_from_array_masked_array_nan_fill(self):
        from xdem_tpu.georef import Affine
        from xdem_tpu.raster import Raster

        base = np.full((4, 5), 100.0)
        base[1, 2] = -9999.0
        marr = np.ma.masked_array(base, mask=(base == -9999.0))
        r = Raster.from_array(marr, Affine.from_origin(0, 40, 10, 10), 32633)
        arr = np.asarray(r.data)
        assert np.isnan(arr[1, 2])  # masked pixel became NaN, not -9999
        assert np.nanmean(arr) == pytest.approx(100.0)

    def test_from_array_list_nodata(self):
        from xdem_tpu.georef import Affine
        from xdem_tpu.raster import Raster

        r = Raster.from_array([[1.0, -9.0], [3.0, 4.0]],
                              Affine.from_origin(0, 20, 10, 10), 32633, nodata=-9.0)
        assert np.isnan(np.asarray(r.data)[0, 1])

    def test_area_or_point_roundtrip(self, tmp_path):
        from xdem_tpu.georef import Affine
        from xdem_tpu.io import read_raster
        from xdem_tpu.raster import Raster

        p = str(tmp_path / "pt.tif")
        Raster(np.ones((3, 4), np.float32), Affine.from_origin(0, 30, 10, 10), 32633,
               area_or_point="Point").save(p)
        assert read_raster(p).area_or_point == "Point"
        p2 = str(tmp_path / "ar.tif")
        Raster(np.ones((3, 4), np.float32), Affine.from_origin(0, 30, 10, 10), 32633).save(p2)
        assert read_raster(p2).area_or_point == "Area"

    def test_tag_xml_escaping(self, tmp_path):
        from xdem_tpu.georef import Affine
        from xdem_tpu.io import read_raster
        from xdem_tpu.raster import Raster

        tags = {"desc": 'slope < 30 & "aspect" > 5', "a&b": "<x>"}
        p = str(tmp_path / "esc.tif")
        Raster(np.ones((3, 3), np.float32), Affine.from_origin(0, 30, 10, 10), 32633,
               tags=tags).save(p)
        assert read_raster(p).tags == tags

    def test_vector_geojson_crs_and_ring_closure(self, tmp_path):
        from xdem_tpu.vector import Vector

        ring = np.array([[5.0e5, 8.0e6], [5.1e5, 8.0e6], [5.1e5, 8.1e6], [5.0e5, 8.1e6]])
        v = Vector([[ring]], crs=32633)
        p = str(tmp_path / "v.geojson")
        v.save(p)
        import json

        gj = json.load(open(p))
        coords = gj["features"][0]["geometry"]["coordinates"][0]
        assert coords[0] == coords[-1]  # RFC 7946 closed ring
        back = Vector.from_geojson(p)
        assert back.crs.epsg == 32633  # not rebranded as 4326
        np.testing.assert_allclose(back.polygons[0][0], ring)  # closure stripped on read

    def test_reproject_ceil_keeps_fractional_edge(self):
        from xdem_tpu.georef import Affine
        from xdem_tpu.raster import Raster

        r = Raster(np.ones((10, 10), np.float32), Affine.from_origin(0, 100, 10, 10), 32633)
        out = r.reproject(res=33.0)  # 100/33 = 3.03 -> ceil 4 columns, not 3
        assert out.shape == (4, 4)
        # exact multiple stays exact
        out2 = r.reproject(res=25.0)
        assert out2.shape == (4, 4)
        out3 = r.reproject(res=10.0)
        assert out3.shape == (10, 10)
