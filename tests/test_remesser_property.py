"""Property test (SURVEY.md §7 hard parts): random records → mess them the
way the reference corpus is messed (§1.2 knobs) → recover → byte-equal.

The messer here is an independent reimplementation of the corruption
process measured from the reference file; if the repair in
sources/messy_csv.py disagrees with it on ANY generated record, the
double-encoding unwrap has corrupted legitimate quotes."""

import csv
import io

from hypothesis import given, settings, strategies as st

from superstore_data_pipeline_analytics_dashboard__spark.sources.messy_csv import (
    read_superstore_csv,
)

# characters seen in the reference names: word chars, space, comma, quote,
# semicolon, NBSP, curly quotes, accents (SURVEY.md §1.2)
_NAME_ALPHABET = st.sampled_from(
    list("abcXYZ019 ,\";") + [" ", "“", "”", "ö", "é", "¾"]
)
_name = st.text(alphabet=_NAME_ALPHABET, min_size=1, max_size=40).map(str.strip).filter(bool)
_plain = st.text(alphabet=st.sampled_from(list("abcDEF123-")), min_size=1, max_size=12)


def _mess_record(fields: list[str]) -> str:
    """The reference corruption (FIXTURES.md F1 knobs 1-2): CSV-encode,
    then wrap-and-double-quote if the name has , or \", then append ';'
    unless the name contains ';'."""
    buf = io.StringIO()
    csv.writer(buf, lineterminator="").writerow(fields)
    line = buf.getvalue()
    name = fields[16]
    if ("," in name) or ('"' in name):
        line = '"' + line.replace('"', '""') + '"'
    if ";" not in name:
        line += ";"
    return line


@st.composite
def _records(draw):
    name = draw(_name)
    row_id = draw(st.integers(1, 99999))
    plain = [draw(_plain) for _ in range(14)]
    sales = f"{draw(st.floats(0.1, 10000, allow_nan=False)):.4f}"
    qty = str(draw(st.integers(1, 14)))
    disc = "0.2"
    profit = f"{draw(st.floats(-500, 500, allow_nan=False)):.4f}"
    return [str(row_id), *plain[:3], plain[3], plain[4], plain[5], plain[6],
            plain[7], plain[8], plain[9], plain[10], plain[11], plain[12],
            plain[13], "Cat", name, sales, qty, disc, profit][:21] + []


@given(st.lists(_records(), min_size=1, max_size=8, unique_by=lambda r: r[0]))
@settings(max_examples=25, deadline=None)
def test_mess_then_recover_roundtrip(spark, tmp_path_factory, records):
    header = (
        "Row ID,Order ID,Order Date,Ship Date,Ship Mode,Customer ID,"
        "Customer Name,Segment,Country,City,State,Postal Code,Region,"
        "Product ID,Category,Sub-Category,Product Name,Sales,Quantity,"
        "Discount,Profit;"
    )
    # pad every record to exactly 21 fields
    fixed = []
    for r in records:
        r = (r + [""] * 21)[:21]
        fixed.append(r)
    content = header + "\r\n" + "\r\n".join(_mess_record(r) for r in fixed) + "\r\n"
    path = tmp_path_factory.mktemp("remess") / "messy.csv"
    path.write_bytes(content.encode("cp1252", errors="replace"))

    df = read_superstore_csv(spark, str(path))
    got = {r["SourceRowNum"]: r for r in df.collect()}
    assert len(got) == len(fixed)
    for r in fixed:
        row = got[int(r[0])]
        expected_name = r[16]
        assert row["Product Name"] == expected_name, (
            f"name corrupted: {expected_name!r} -> {row['Product Name']!r}"
        )
        assert row["Profit"] == r[20]
        assert row["Sales"] == r[17]
