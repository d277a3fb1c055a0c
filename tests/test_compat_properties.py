"""Property-based codec tests (hypothesis): arbitrary feature dicts
survive encode->decode; TFRecord framing survives arbitrary payloads."""

from hypothesis import given, settings
from hypothesis import strategies as st

from dataset_grouper_spark.compat import tfexample, tfrecord

feature_values = st.one_of(
    st.binary(max_size=200),
    st.text(max_size=100),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=20),
    st.lists(st.binary(max_size=50), min_size=1, max_size=10),
)

names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=127),
    min_size=1,
    max_size=20,
)


@given(st.dictionaries(names, feature_values, max_size=8))
@settings(max_examples=200, deadline=None)
def test_example_roundtrip(feats):
    decoded = tfexample.decode_example(tfexample.encode_example(feats))
    for k, v in feats.items():
        got = decoded[k]
        if isinstance(v, bytes):
            assert got == [v]
        elif isinstance(v, str):
            assert got == [v.encode()]
        elif isinstance(v, int):
            assert got == [v]
        elif isinstance(v, list) and v and isinstance(v[0], bytes):
            assert got == v
        else:  # int list (possibly empty)
            assert got == v


@given(st.lists(st.binary(max_size=500), max_size=20))
@settings(max_examples=100, deadline=None)
def test_sequence_example_roundtrip(blobs):
    seq = tfexample.create_sequence_example(blobs)
    assert tfexample.parse_sequence_example(seq) == blobs


@given(st.lists(st.binary(max_size=1000), max_size=10))
@settings(max_examples=50, deadline=None)
def test_tfrecord_roundtrip(tmp_path_factory, recs):
    path = str(tmp_path_factory.mktemp("tfr") / "f.tfrecord")
    tfrecord.write_records(path, recs)
    assert list(tfrecord.read_records(path)) == recs
