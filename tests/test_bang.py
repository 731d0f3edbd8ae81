"""Bang-command parity (BangCommandTest.java:13-19 plus the mid-query
join and !ddg cases the reference implements but doesn't test)."""

from marginalia_ray.query.bang import bang_redirect


class TestBangCommand:
    def test_reference_vectors(self):
        assert bang_redirect("search terms !g") == (
            "https://www.google.com/search?q=search+terms"
        )
        assert bang_redirect("search terms!g") is None
        assert bang_redirect("!gsearch terms") is None
        assert bang_redirect("!g search terms") == (
            "https://www.google.com/search?q=search+terms"
        )

    def test_mid_query_joins_with_one_space(self):
        assert bang_redirect("search !g terms") == (
            "https://www.google.com/search?q=search+terms"
        )

    def test_ddg(self):
        assert bang_redirect("!ddg privacy") == (
            "https://duckduckgo.com/search?q=privacy"
        )

    def test_no_bang(self):
        assert bang_redirect("plain query") is None

    def test_encoding(self):
        assert bang_redirect("a&b !g") == "https://www.google.com/search?q=a%26b"

    def test_tab_is_not_a_space_char(self):
        # Character.isSpaceChar('\t') is false — "term\t!g" must NOT match
        assert bang_redirect("term\t!g") is None


class TestPunchCards:
    """BrailleBlockPunchCards.java bit-permutation vectors (the
    reference's test only prints the 0..512 table)."""

    def test_bit_permutation(self):
        from marginalia_ray.functions.punchcard import print_bits

        # empty mask -> blank braille block
        assert print_bits(0, 8) == "⠀"
        # native bit 0 -> braille dot 1 (0x01)
        assert print_bits(1, 8) == "⠁"
        # native bit 3 (0x08) -> braille bit 0x40 (<<3)
        assert print_bits(8, 8) == "⡀"
        # native bits 4-6 (0x70) shift right once -> 0x38
        assert print_bits(0x70, 8) == chr(0x2800 + 0x38)
        # native bit 7 stays (0x80)
        assert print_bits(0x80, 8) == chr(0x2800 + 0x80)
        # all 8 bits -> full 0xFF block
        assert print_bits(0xFF, 8) == chr(0x2800 + 0xFF)

    def test_multi_chunk_lsb_first(self):
        from marginalia_ray.functions.punchcard import print_bits

        # 56-bit position mask renders 7 chars, LSB chunk first
        s = print_bits(0x01, 56)
        assert len(s) == 7
        assert s[0] == "⠁" and set(s[1:]) == {"⠀"}
