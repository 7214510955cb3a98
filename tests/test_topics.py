"""Topic-reader registry tests: inline fixtures per format plus pins on
the reference's own checked-in topic files (round-4 verdict task 5)."""

import os

import pytest

from anserini_spark.io.topics import (
    read_microblog_topics,
    read_prioritized_web_topics,
    read_topics,
    read_tsv_string_topics,
    read_web_topics,
    read_webxml_topics,
)

REF_TOPICS = "/root/reference/src/main/resources/topics-and-qrels"


def test_webxml_inline(tmp_path):
    p = tmp_path / "t.xml"
    p.write_text(
        '<?xml version="1.0"?>\n<webtrack2013>\n'
        '<topic number="201" type="faceted">\n'
        "<query>raspberry pi</query>\n"
        "<description>what is it</description>\n"
        "</topic>\n"
        '<topic number="202" type="single">\n'
        "<query>uss carl vinson</query>\n"
        "</topic>\n</webtrack2013>\n"
    )
    assert read_webxml_topics(str(p)) == {
        201: "raspberry pi", 202: "uss carl vinson"}


def test_web_and_prioritized_inline(tmp_path):
    p = tmp_path / "mq.txt"
    p.write_text("1:delta air lines\n2:kitchen canister sets\n")
    assert read_web_topics(str(p)) == {
        1: "delta air lines", 2: "kitchen canister sets"}
    q = tmp_path / "pmq.txt"
    q.write_text("20001:1:obama family tree\n20002:2:french lick:resort\n")
    # reference PrioritizedWebTopicReader: substringAfterLast(line, ":")
    # — a colon INSIDE the query keeps only the text after the LAST
    # colon (mirrored exactly; term-identical regression runs)
    assert read_prioritized_web_topics(str(q)) == {
        20001: "obama family tree", 20002: "resort"}


def test_web_reader_colon_truncation(tmp_path):
    # reference WebTopicReader: line.split(":")[1] — a colon inside the
    # query truncates at the SECOND colon
    p = tmp_path / "mq.txt"
    p.write_text("7:time:machine repair\n8:plain query\n")
    assert read_web_topics(str(p)) == {7: "time", 8: "plain query"}


def test_sniff_prioritized_requires_shape_on_all_lines(tmp_path):
    from anserini_spark.io.topics import read_topics

    # first query starts with digits-colon but later lines don't match
    # qid:priority:query — must parse as plain qid:query (preserving
    # the reference WebTopicReader split(":")[1] semantics), not drop
    # text into a phantom priority field
    p = tmp_path / "unregistered_mq_like.txt"
    p.write_text("101:2:1 odds of winning\n102:delta air lines\n"
                 "103:kitchen canister sets\n")
    assert read_topics(str(p)) == {
        101: "2", 102: "delta air lines", 103: "kitchen canister sets"}
    # uniformly 3-field files still sniff as prioritized
    q = tmp_path / "unregistered_pmq_like.txt"
    q.write_text("20001:1:obama family tree\n20002:2:dog training\n")
    assert read_topics(str(q)) == {
        20001: "obama family tree", 20002: "dog training"}


def test_microblog_inline(tmp_path):
    p = tmp_path / "mb.txt"
    p.write_text(
        "<top>\n<num> Number: MB001 </num>\n"
        "<title> BBC World Service staff cuts </title>\n"
        "<querytweettime> 34952194402811904 </querytweettime>\n</top>\n\n"
        "<top>\n<num> Number: MB051 </num>\n"
        "<query> British Government cuts </query>\n</top>\n"
    )
    assert read_microblog_topics(str(p)) == {
        1: "BBC World Service staff cuts", 51: "British Government cuts"}


def test_tsv_string_inline(tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("ACLIA2-CS-0002\tsome query\n")
    assert read_tsv_string_topics(str(p)) == {"ACLIA2-CS-0002": "some query"}


def test_sniff_unregistered(tmp_path):
    """Files NOT in the registry dispatch by content shape."""
    xml = tmp_path / "mytopics.xml"
    xml.write_text('<topic number="7">\n<query>x</query>\n</topic>\n')
    assert read_topics(str(xml)) == {7: "x"}
    tsv = tmp_path / "dev.queries.tsv"
    tsv.write_text("5\thello world\n")
    assert read_topics(str(tsv)) == {5: "hello world"}
    colon = tmp_path / "queries.txt"
    colon.write_text("9:a colon query\n")
    assert read_topics(str(colon)) == {9: "a colon query"}


# (file, expected_count, probe_qid, expected_query) — pinned against the
# reference's checked-in files; every reader in the registry is covered.
REF_PINS = [
    ("topics.web.201-250.txt", 50, 201, "raspberry pi"),
    ("topics.web.51-100.txt", 50, 51, "horse hooves"),
    ("topics.web.1-50.txt", 50, 1, "obama family tree"),
    ("topics.mq.1-10000.txt", 10000, 1, "after school program evaluation"),
    ("topics.mq.20001-60000.txt", 40000, 20001, "obama family tree"),
    ("topics.microblog2011.txt", 50, 1, "BBC World Service staff cuts"),
    ("topics.microblog2012.txt", 60, 51, "British Government cuts"),
    ("topics.msmarco-passage.dev-subset.txt", 6980, 2,
     "Androgen receptor define"),
    ("topics.ntcir8zh.eval.txt", 73, "ACLIA2-CS-0002",
     "《千里走单骑》和张艺谋是什么关系？"),
    ("topics.robust04.txt", 250, 301, "International Organized Crime"),
    ("topics.adhoc.51-100.txt", 50, 51, "Airbus Subsidies"),
    ("topics.terabyte05.efficiency.txt", 50000, 1,
     "pierson s twin lakes marina"),
    ("topics.dl19-passage.txt", 43, 19335,
     "anthropological definition of environment"),
    ("topics.core18.txt", 50, 321, "Women in Parliaments"),
]


@pytest.mark.skipif(not os.path.isdir(REF_TOPICS),
                    reason="reference checkout not present")
@pytest.mark.parametrize("fname,count,qid,query",
                         REF_PINS, ids=[p[0] for p in REF_PINS])
def test_reference_topic_files(fname, count, qid, query):
    topics = read_topics(os.path.join(REF_TOPICS, fname))
    assert len(topics) == count
    assert topics[qid] == query


def test_malformed_topic_lines_raise(tmp_path):
    """Negative cases mirroring the reference TopicReaderTest edges:
    a <topic> element without number= must fail loudly, as must a
    microblog <top> without an MB num or title/query."""
    bad_xml = tmp_path / "badweb.xml"
    bad_xml.write_text("<topic>\n<query>x</query>\n</topic>\n")
    with pytest.raises(ValueError, match="without number"):
        read_webxml_topics(str(bad_xml))
    bad_mb = tmp_path / "badmb.txt"
    bad_mb.write_text("<top>\n<num> Number: 7 </num>\n"
                      "<title> t </title>\n</top>\n")
    with pytest.raises(ValueError, match="MB number"):
        read_microblog_topics(str(bad_mb))
    bad_mb2 = tmp_path / "badmb2.txt"
    bad_mb2.write_text("<top>\n<num> Number: MB007 </num>\n</top>\n")
    with pytest.raises(ValueError, match="without title/query"):
        read_microblog_topics(str(bad_mb2))


def test_bom_and_mixed_encoding(tmp_path):
    """A UTF-8 BOM must not break qid parsing or format sniffing, and
    non-UTF8 (latin-1) bytes decode with replacement instead of
    failing the file — the MQ files in the wild contain both."""
    bom_tsv = tmp_path / "bom.tsv"
    bom_tsv.write_bytes("﻿5\thello world\n".encode("utf-8"))
    assert read_topics(str(bom_tsv)) == {5: "hello world"}
    bom_colon = tmp_path / "bomq.txt"
    bom_colon.write_bytes("﻿9:a colon query\n".encode("utf-8"))
    assert read_topics(str(bom_colon)) == {9: "a colon query"}
    latin = tmp_path / "latin.txt"
    latin.write_bytes(b"12:caf\xe9 au lait\n")  # latin-1 e-acute
    got = read_topics(str(latin))
    assert list(got) == [12]
    assert got[12].startswith("caf") and got[12].endswith(" au lait")


def test_microblog_querytweettime():
    """<querytweettime> extraction feeding search_tweets' range
    filter, on the reference's own 2011 topic file."""
    import os

    from anserini_spark.io.topics import (read_microblog_times,
                                          read_microblog_topics)

    path = ("/root/reference/src/main/resources/topics-and-qrels/"
            "topics.microblog2011.txt")
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference checkout not present")
    topics = read_microblog_topics(path)
    times = read_microblog_times(path)
    assert set(times) == set(topics)
    assert times[1] == 34952194402811904
    assert times[2] == 35048150574039040
    assert all(t > 0 for t in times.values())
