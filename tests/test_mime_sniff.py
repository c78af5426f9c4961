"""Magic-byte MIME sniffing flags exactly the spoofed labels."""

import __spark_entry__ as entry


def test_mime_sniff_flags_exactly_the_spoofed_rows(spark):
    rows = entry.q_mime_sniff(spark, "/root/testdata/sf0.001").collect()
    total = sum(r["n"] for r in rows)
    mismatched = sum(r["n"] for r in rows if r["declared"] != r["sniffed"])
    assert total == 64
    # every 5th of 64 images is spoofed -> ceil(64/5) = 13 mismatches
    assert mismatched == 13
    # and the sniffer itself never errs: each sniffed class is non-empty
    sniffed = {r["sniffed"] for r in rows}
    assert sniffed == {"png", "qdct"}
