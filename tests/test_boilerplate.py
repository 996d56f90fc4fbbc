"""jusText-style block segmentation + classification."""

from bathyscaphe_spark.operators.boilerplate import (
    block_segments,
    block_segments_py,
    classify_blocks,
    main_content,
)


class TestKernel:
    def test_blocks_and_link_chars(self):
        html = (
            '<body><nav><a href="/">home</a> <a href="/a">about</a></nav>'
            "<p>real content here</p></body>"
        )
        # link_chars sums the linked runs only ("home"+"about" = 9); the
        # joining space between the two anchors counts toward chars alone
        assert block_segments_py(html) == [
            ("home about", 10, 9),
            ("real content here", 17, 0),
        ]

    def test_mixed_block_counts_join_spaces_in_chars_only(self):
        # "more" is linked (4 link chars); the joining space between the
        # anchor run and the tail run counts toward chars, not link_chars
        html = '<div><a href="/x">more</a> plain tail</div>'
        assert block_segments_py(html) == [("more plain tail", 15, 4)]

    def test_script_and_style_skipped(self):
        html = "<p>keep</p><script>var x = 'drop';</script><style>p{}</style>"
        assert block_segments_py(html) == [("keep", 4, 0)]

    def test_nested_anchor_depth(self):
        # two data runs inside one anchor ("deep", "link"): the joining
        # space counts toward chars only, so link_chars = 4 + 4 = 8
        html = '<p><a href="/"><b>deep</b> link</a> out</p>'
        assert block_segments_py(html) == [("deep link out", 13, 8)]

    def test_empty_blocks_not_emitted(self):
        assert block_segments_py("<div></div><p>  </p><p>x</p>") == [("x", 1, 0)]

    def test_bytes_none_and_broken(self):
        assert block_segments_py(None) == []
        assert block_segments_py(b"<p>bytes ok</p>") == [("bytes ok", 8, 0)]
        # unterminated tag: parser must not raise
        assert isinstance(block_segments_py("<p>tail<a hre"), list)

    def test_whitespace_collapse(self):
        assert block_segments_py("<p>a\n\n  b\tc</p>") == [("a b c", 5, 0)]


class TestClassify:
    def _labels(self, spark, rows, parts=3):
        df = spark.createDataFrame(
            rows, "doc_id long, block_idx int, text string,"
            " chars long, link_chars long"
        )
        out = classify_blocks(df.repartition(parts))
        return {
            (r["doc_id"], r["block_idx"]): (r["ctx_label"], r["label"])
            for r in out.collect()
        }

    def test_promotion_between_good_neighbors(self, spark):
        rows = [
            (1, 0, "x" * 60, 60, 0),   # good
            (1, 1, "caption", 7, 0),    # short → promoted
            (1, 2, "y" * 60, 60, 0),   # good
        ]
        got = self._labels(spark, rows)
        assert got[(1, 1)] == ("short", "good")

    def test_demotion_at_edges_and_near_bad(self, spark):
        rows = [
            (2, 0, "title", 5, 0),      # short, no prev → bad
            (2, 1, "nav nav", 7, 7),    # link-dense → bad
            (2, 2, "z" * 80, 80, 0),   # good
            (2, 3, "footer", 6, 0),     # short, no next good → bad
        ]
        got = self._labels(spark, rows)
        assert got[(2, 0)] == ("short", "bad")
        assert got[(2, 1)] == ("bad", "bad")
        assert got[(2, 2)] == ("good", "good")
        assert got[(2, 3)] == ("short", "bad")

    def test_link_density_boundary_exact(self, spark):
        # 33.0% exactly: 33*1000 >= 330*100 → bad; one char less → not
        rows = [
            (3, 0, "a" * 100, 100, 33),
            (3, 1, "b" * 100, 100, 32),
        ]
        got = self._labels(spark, rows)
        assert got[(3, 0)][0] == "bad"
        assert got[(3, 1)][0] == "good"

    def test_partition_invariance(self, spark):
        rows = [
            (d, i, f"t{d}_{i}" + "x" * ((d * 7 + i * 13) % 90),
             4 + ((d * 7 + i * 13) % 90), (i * d) % 20)
            for d in range(8) for i in range(6)
        ]
        a = self._labels(spark, rows, parts=1)
        b = self._labels(spark, rows, parts=8)
        assert a == b


class TestMainContent:
    def test_end_to_end(self, spark):
        body = "word " * 20  # 99 chars after collapse → good
        html = (
            '<html><body><nav><a href="/">home</a><a href="/a">more</a></nav>'
            f"<p>{body}</p><div>tiny</div><p>{body}</p>"
            "<footer>copyright</footer></body></html>"
        )
        df = spark.createDataFrame([(7, html)], "doc_id long, html string")
        out = main_content(df).collect()
        assert len(out) == 1
        txt = out[0]["main_text"]
        collapsed = " ".join(body.split())
        # tiny div PROMOTED between the two good paragraphs; nav/footer gone
        assert txt == f"{collapsed} tiny {collapsed}"

    def test_all_boilerplate_page_yields_no_row(self, spark):
        html = '<nav><a href="/">only links</a></nav><footer>c</footer>'
        df = spark.createDataFrame([(1, html)], "doc_id long, html string")
        assert main_content(df).collect() == []
