"""C4 line-level filtering rules (Raffel et al. 2020 §2.2) on
hand-built fixtures with known outcomes."""

from linkgraph.functions.quality import c4_clean, c4_signals

DOCS = [
    # (id, text)
    (0, "This is a good first sentence.\nAnd a second good one!\nIs this a third question?"),
    (1, "short line.\nno punct here at all\nAnother proper sentence is right here."),
    (2, "Contains the word javascript in a long sentence here.\nA second proper sentence right here.\nA third proper sentence right here.\nA fourth proper sentence right here."),
    (3, "A fine document sentence number one.\nlorem ipsum dolor sit amet is here.\nFine sentence number three right here."),
    (4, "var x = { a: 1 };\nA perfectly fine sentence right here.\nAnother perfectly fine sentence here.\nA third fine sentence right here."),
    (5, "Tiny.\nAlso tiny.\nStill tiny."),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def test_c4_signals(spark):
    rows = {r["doc_id"]: r for r in c4_signals(_df(spark)).collect()}
    # doc 0: all 3 lines end in terminal punct and have >=5 words
    assert rows[0]["n_kept_lines"] == 3 and rows[0]["c4_keep"]
    # doc 1: line1 too short, line2 no punct -> only line3 kept -> <3 sentences
    assert rows[1]["n_kept_lines"] == 1 and not rows[1]["c4_keep"]
    # doc 2: javascript line dropped, 3 good lines remain -> keep
    assert rows[2]["n_kept_lines"] == 3 and rows[2]["c4_keep"]
    # doc 3: lorem ipsum kills the whole document
    assert rows[3]["has_lorem_ipsum"] and not rows[3]["c4_keep"]
    # doc 4: curly brace kills the whole document
    assert rows[4]["has_brace"] and not rows[4]["c4_keep"]
    # doc 5: every line < 5 words
    assert rows[5]["n_kept_lines"] == 0 and not rows[5]["c4_keep"]


def test_c4_clean(spark):
    out = {r["doc_id"]: r["text"] for r in c4_clean(_df(spark)).collect()}
    assert set(out) == {0, 2}
    assert out[0] == DOCS[0][1]
    assert out[2] == "\n".join(DOCS[2][1].split("\n")[1:])
