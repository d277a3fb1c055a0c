"""Roaring bitmap + Z85 + Delta DV framing: spec vectors, closed loop."""

import struct

import pytest

from dataset_grouper_spark.sources import roaring as R


def test_z85_zeromq_spec_vector():
    # the RFC 32 reference vector: 86 4F D2 6F B5 59 F7 5B <-> HelloWorld
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert R.z85_encode(raw) == "HelloWorld"
    assert R.z85_decode("HelloWorld") == raw


def test_z85_rejects_bad_input():
    with pytest.raises(ValueError, match="multiple of 4"):
        R.z85_encode(b"abc")
    with pytest.raises(ValueError, match="multiple of 5"):
        R.z85_decode("abcd")
    with pytest.raises(ValueError, match="invalid character"):
        R.z85_decode('abcd"')


def test_roaring32_roundtrip_array_and_bitmap_containers():
    for vals in ([], [0], [65535, 65536], list(range(5000)),
                 [0xFFFFFFFF], list(range(0, 200000, 3))):
        got, used = R.roaring32_deserialize(R.roaring32_serialize(vals))
        assert got == sorted(set(vals))


def test_roaring32_hand_built_no_run_stream():
    # one array container, key 0, values {1, 4}: built by hand per spec
    stream = struct.pack(
        "<ii"  # cookie 12347, 1 container
        "HH"   # key 0, cardinality-1 = 1
        "I"    # offset of container payload
        "HH",  # values 1, 4
        12347, 1, 0, 1, 16, 1, 4,
    )
    vals, used = R.roaring32_deserialize(stream)
    assert vals == [1, 4] and used == len(stream)


def test_roaring32_run_container_stream():
    # cookie 12346 with size-1 in the upper 16 bits, run flag set,
    # one run container: runs [5..8] and [100..100]
    cookie = 12346 | ((1 - 1) << 16)
    stream = (
        struct.pack("<i", cookie)
        + b"\x01"            # run flags: container 0 is a run
        + struct.pack("<HH", 0, 4)   # key 0, cardinality-1 (5 values)
        # < NO_OFFSET_THRESHOLD containers with runs: no offset header
        + struct.pack("<H", 2)       # 2 runs
        + struct.pack("<HH", 5, 3)   # 5..8
        + struct.pack("<HH", 100, 0) # 100
    )
    vals, used = R.roaring32_deserialize(stream)
    assert vals == [5, 6, 7, 8, 100] and used == len(stream)


def test_roaring64_buckets():
    vals = [3, 2**32 + 7, 2**32 + 1, 5 * 2**32]
    assert R.roaring64_deserialize(R.roaring64_serialize(vals)) == sorted(vals)


def test_dv_payload_magic_enforced():
    data = R.dv_data_encode([1, 2])
    assert R.dv_data_decode(data) == [1, 2]
    with pytest.raises(ValueError, match="bad magic"):
        R.dv_data_decode(b"\x00\x00\x00\x00" + data[4:])


def test_dv_file_framing_and_crc(tmp_path):
    p = str(tmp_path / "dv.bin")
    offset, size, card = R.dv_file_write(p, [10, 20, 10])
    assert (offset, card) == (1, 2)
    assert R.dv_file_read(p, offset, size) == [10, 20]
    raw = bytearray(open(p, "rb").read())
    raw[-6] ^= 0xFF  # corrupt a data byte
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC mismatch"):
        R.dv_file_read(p, offset, size)


def test_dv_file_size_mismatch(tmp_path):
    p = str(tmp_path / "dv.bin")
    _, size, _ = R.dv_file_write(p, [1])
    with pytest.raises(ValueError, match="size mismatch"):
        R.dv_file_read(p, 1, size + 4)
