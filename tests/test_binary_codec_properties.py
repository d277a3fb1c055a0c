"""Property tests for the two binary codecs that face FOREIGN bytes:
the Delta deletion-vector stack (Z85 + roaring + DV framing,
sources/roaring.py) and HoodieLogFormat block framing
(sources/hudi_log.py).

The headline law is SPLIT INVARIANCE for the log scanner (the r10
cross-file rollback fix): decoding a file group's block stream must
not depend on where Hudi's size-based rollover happened to cut it
into ``.log.N`` files — any block-boundary split of any block
sequence yields exactly the records of the unsplit stream, including
the supersedence order.
"""

from __future__ import annotations

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from dataset_grouper_spark.sources import hudi_log
from dataset_grouper_spark.sources import roaring as R

# ------------------------------------------------------------- roaring

positions = st.sets(
    st.one_of(
        st.integers(0, 2**16),          # dense low keys (array/bitmap)
        st.integers(0, 2**32 - 1),      # full 32-bit range
        st.integers(0, 2**40),          # multi-bucket 64-bit keys
    ),
    max_size=400,
)


@given(positions)
@settings(max_examples=60, deadline=None)
def test_roaring64_roundtrip_any_positions(vals):
    want = sorted(vals)
    got = R.roaring64_deserialize(R.roaring64_serialize(want))
    assert got == want


@given(st.sets(st.integers(0, 2**32 - 1), max_size=400))
@settings(max_examples=60, deadline=None)
def test_roaring32_roundtrip_any_positions(vals):
    want = sorted(vals)
    data = R.roaring32_serialize(want)
    got, _consumed = R.roaring32_deserialize(data)
    assert got == want


@given(st.integers(1, 80_000), st.integers(1, 5000))
@settings(max_examples=20, deadline=None)
def test_roaring_dense_run_shape(start, length):
    # contiguous runs exercise the bitmap/array container switch
    want = list(range(start, start + length))
    got = R.roaring64_deserialize(R.roaring64_serialize(want))
    assert got == want


@given(st.binary(min_size=0, max_size=64).map(
    lambda b: b + b"\x00" * (-len(b) % 4)
))
@settings(max_examples=100, deadline=None)
def test_z85_roundtrip_any_aligned_bytes(data):
    assert R.z85_decode(R.z85_encode(data)) == data


@given(positions)
@settings(max_examples=40, deadline=None)
def test_dv_payload_roundtrip(vals):
    want = sorted(vals)
    assert R.dv_data_decode(R.dv_data_encode(want)) == want


@given(positions, st.integers(0, 2**31))
@settings(max_examples=25, deadline=None)
def test_dv_file_framing_roundtrip(tmp_path_factory, vals, salt):
    want = sorted(vals)
    d = tmp_path_factory.mktemp("dv")
    p = os.path.join(str(d), f"dv_{salt}.bin")
    offset, size, card = R.dv_file_write(p, want)
    assert card == len(want)
    assert R.dv_file_read(p, offset, size) == want


# ----------------------------------------------------------- hudi_log

_SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": ["null", "long"]},
        {"name": "v", "type": ["null", "string"]},
    ],
}

_INSTANTS = ["101", "102", "103"]

_rec = st.fixed_dictionaries(
    {
        "id": st.integers(-(2**40), 2**40),
        "v": st.one_of(st.none(), st.text(max_size=8)),
    }
)

_block = st.one_of(
    st.tuples(
        st.just("data"),
        st.sampled_from(_INSTANTS),
        st.lists(_rec, min_size=1, max_size=4),
    ),
    st.tuples(
        st.just("del"),
        st.sampled_from(_INSTANTS),
        st.lists(
            st.integers(0, 9).map(
                lambda k: {"recordKey": str(k), "partitionPath": ""}
            ),
            min_size=1,
            max_size=3,
        ),
    ),
    st.tuples(
        st.just("rb"),
        st.sampled_from(_INSTANTS),
        st.sampled_from(_INSTANTS),  # target instant
    ),
)


def _frame(blocks) -> list[bytes]:
    out = []
    for kind, instant, payload in blocks:
        if kind == "data":
            out.append(
                hudi_log.encode_avro_data_block(payload, _SCHEMA, instant)
            )
        elif kind == "del":
            out.append(hudi_log.encode_delete_block(payload, instant))
        else:
            out.append(hudi_log.encode_rollback_block(instant, payload))
    return out


@given(
    st.lists(_block, min_size=1, max_size=8),
    st.sets(st.sampled_from(_INSTANTS)),
    st.data(),
)
@settings(max_examples=80, deadline=None)
def test_log_stream_split_invariance(blocks, completed, data):
    """Any block-boundary split into rollover files decodes exactly
    like the unsplit stream — rollback COMMAND_BLOCKs included."""
    framed = _frame(blocks)
    whole = hudi_log.read_log_stream_records(
        [b"".join(framed)], completed or None
    )
    n_cuts = data.draw(st.integers(0, min(3, len(framed) - 1)))
    cuts = sorted(
        data.draw(
            st.sets(
                st.integers(1, len(framed) - 1),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
        if len(framed) > 1
        else set()
    )
    parts, prev = [], 0
    for c in cuts + [len(framed)]:
        parts.append(b"".join(framed[prev:c]))
        prev = c
    split = hudi_log.read_log_stream_records(
        [p for p in parts if p], completed or None
    )
    assert split == whole


@given(
    st.lists(_block, min_size=1, max_size=6),
    st.binary(min_size=1, max_size=24).filter(lambda b: b"#HUDI#" not in b),
)
@settings(max_examples=60, deadline=None)
def test_log_corrupt_junk_between_blocks_recovered(blocks, junk):
    """Garbage between framed blocks surfaces as CORRUPT_BLOCK regions
    and every real block's records still decode."""
    framed = _frame(blocks)
    clean = hudi_log.read_log_stream_records([b"".join(framed)])
    dirty_bytes = junk + framed[0] + junk.join(framed[1:])
    dirty = hudi_log.read_log_stream_records([dirty_bytes])
    assert [(op, i, r) for op, i, _s, r in dirty] == [
        (op, i, r) for op, i, _s, r in clean
    ]


@given(st.lists(_block, min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_log_truncated_tail_never_corrupts_earlier_blocks(blocks):
    framed = _frame(blocks)
    whole = b"".join(framed)
    truncated = whole[: len(whole) - 7]  # break the final block
    got = hudi_log.read_log_stream_records([truncated])
    want = hudi_log.read_log_stream_records([b"".join(framed[:-1])])
    assert [(op, i, r) for op, i, _s, r in got] == [
        (op, i, r) for op, i, _s, r in want
    ]


@given(st.lists(_rec, min_size=1, max_size=6),
       st.sampled_from(_INSTANTS))
@settings(max_examples=40, deadline=None)
def test_avro_data_block_payload_roundtrip(recs, instant):
    blk = hudi_log.encode_avro_data_block(recs, _SCHEMA, instant)
    decoded = hudi_log.read_log_blocks(blk)
    assert len(decoded) == 1
    b = decoded[0]
    assert b["header"]["INSTANT_TIME"] == instant
    assert json.loads(b["header"]["SCHEMA"]) == _SCHEMA
    assert hudi_log.decode_avro_data_block(b) == recs
