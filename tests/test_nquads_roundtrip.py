"""Property-based N-Quads escaping round-trip: any literal/IRI content the
engine writes must read back identical (hypothesis-driven)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# printable-ish unicode + the escaping-relevant troublemakers
nasty = st.text(
    alphabet=st.one_of(
        st.characters(blacklist_categories=("Cs", "Cc")),
        st.sampled_from(['"', "\\", "\n", "\r", "\t", "'", "<", ">", " "]),
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lit=nasty)
def test_literal_round_trip(spark, tmp_path_factory, lit):
    from cam_etl_spark.quads import read_nquads, write_nquads

    path = str(tmp_path_factory.mktemp("nq") / "q.nq")
    quads = spark.createDataFrame(
        [("https://ex.org/s", "https://ex.org/p", lit, "literal", None, None, "urn:g")],
        "subject string, predicate string, object_value string, object_kind string,"
        "object_datatype string, object_lang string, graph string",
    )
    write_nquads(quads, path)
    back = read_nquads(spark, path).collect()
    assert len(back) == 1
    assert back[0]["object_value"] == lit
    assert back[0]["object_kind"] == "literal"
