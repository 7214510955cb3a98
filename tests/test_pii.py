"""PII detection/redaction contract (ops/pii.py)."""

from anserini_spark.ops.pii import scrub


def test_pii_scrub(spark):
    rows = [
        (1, "mail a.b+c@x-1.example.com and d@e.org please"),
        (2, "call +1 415 555 0199 or (020) 7946 0958 now"),
        (3, "server 10.0.3.77 and 192.168.000.001 up"),
        (4, "clean text with no identifiers at all"),
        (5, "mixed a@b.co then 8.8.8.8 then +33 1 23 45 67 89"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (2, 0, 0)
    assert out[1]["redacted"] == "mail <EMAIL> and <EMAIL> please"
    assert out[2]["n_phones"] == 2
    assert out[2]["redacted"] == "call <PHONE> or <PHONE> now"
    assert out[3]["n_ips"] == 2
    assert out[3]["redacted"] == "server <IP> and <IP> up"
    assert out[4]["redacted"] == rows[3][1]
    assert (out[5]["n_emails"], out[5]["n_ips"], out[5]["n_phones"]) == (1, 1, 1)
    assert out[5]["redacted"] == "mixed <EMAIL> then <IP> then <PHONE>"
