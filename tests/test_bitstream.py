"""Bitstream layer tests (model: reference tests/bitstream_tests.cc)."""

import pytest

from libheif_tpu.core.bitstream import ByteReader, ByteWriter, BitReader, BitWriter
from libheif_tpu.core.error import HeifError


class TestByteReader:
    def test_basic_reads(self):
        r = ByteReader(bytes([0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08]))
        assert r.read8() == 0x01
        assert r.read16() == 0x0203
        assert r.read24() == 0x040506
        assert r.read16() == 0x0708
        assert r.eof()

    def test_read32_64(self):
        r = ByteReader(b"\x12\x34\x56\x78\x00\x00\x00\x00\x00\x00\x00\x2a")
        assert r.read32() == 0x12345678
        assert r.read64() == 42

    def test_signed(self):
        r = ByteReader(b"\xff\xff\xff\xff\xff\xfe")
        assert r.read16s() == -1
        assert r.read32s() == -2

    def test_overrun_raises(self):
        r = ByteReader(b"\x01")
        with pytest.raises(HeifError):
            r.read16()

    def test_sub_reader_bounds(self):
        r = ByteReader(b"\x01\x02\x03\x04")
        sub = r.sub_reader(2)
        assert sub.read16() == 0x0102
        with pytest.raises(HeifError):
            sub.read8()
        assert r.read16() == 0x0304

    def test_read_string(self):
        r = ByteReader(b"abc\x00def")
        assert r.read_string() == "abc"
        assert r.read_bytes(3) == b"def"

    def test_read_string_unterminated(self):
        r = ByteReader(b"abc")
        assert r.read_string() == "abc"
        assert r.eof()

    def test_read_uint_sizes(self):
        r = ByteReader(b"\x01\x00\x02\x00\x00\x00\x03")
        assert r.read_uint(1) == 1
        assert r.read_uint(2) == 2
        assert r.read_uint(4) == 3
        assert r.read_uint(0) == 0


class TestByteWriter:
    def test_roundtrip(self):
        w = ByteWriter()
        w.write8(1)
        w.write16(0x0203)
        w.write32(0x04050607)
        w.write64(0x08090A0B0C0D0E0F)
        w.write_string("hi")
        r = ByteReader(w.data())
        assert r.read8() == 1
        assert r.read16() == 0x0203
        assert r.read32() == 0x04050607
        assert r.read64() == 0x08090A0B0C0D0E0F
        assert r.read_string() == "hi"

    def test_patch(self):
        w = ByteWriter()
        w.write32(0)
        w.write8(0xAA)
        w.patch32(0, 1234)
        r = ByteReader(w.data())
        assert r.read32() == 1234
        assert r.read8() == 0xAA

    def test_insert(self):
        w = ByteWriter()
        w.write_bytes(b"abcd")
        w.insert(2, b"XY")
        assert w.data() == b"abXYcd"


class TestBitReaderWriter:
    def test_bits_roundtrip(self):
        w = BitWriter()
        w.write_bits(0b101, 3)
        w.write_bits(0b0011, 4)
        w.write_bits(1, 1)
        w.write_bits(0xABCD, 16)
        r = BitReader(w.data())
        assert r.read_bits(3) == 0b101
        assert r.read_bits(4) == 0b0011
        assert r.read_bits(1) == 1
        assert r.read_bits(16) == 0xABCD

    def test_exp_golomb(self):
        # ue(v) encoding of 0..8
        w = BitWriter()
        for v in range(9):
            n = v + 1
            nbits = n.bit_length()
            w.write_bits(0, nbits - 1)
            w.write_bits(n, nbits)
        w.byte_align()
        r = BitReader(w.data())
        for v in range(9):
            assert r.read_ue() == v

    def test_se(self):
        # se(v): 0,1,-1,2,-2 maps to ue 0,1,2,3,4
        w = BitWriter()
        w.write_bits(1, 1)          # ue=0
        w.write_bits(0b010, 3)      # ue=1
        w.write_bits(0b011, 3)      # ue=2
        w.write_bits(0b00100, 5)    # ue=3
        w.write_bits(0b00101, 5)    # ue=4
        w.byte_align()
        r = BitReader(w.data())
        assert [r.read_se() for _ in range(5)] == [0, 1, -1, 2, -2]

    def test_unaligned_data_raises(self):
        w = BitWriter()
        w.write_bits(1, 3)
        with pytest.raises(HeifError):
            w.data()
        assert len(w.data_padded()) == 1
