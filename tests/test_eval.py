"""MathParser + Units parity (reference assistant-service eval:
MathParser.java, Units.java + units.csv).  The reference's own tests
only print; the vectors here are hand-computed from its semantics —
pass order (parens -> negate -> functions -> ^ -> */ -> +-), NaN on
log-of-negative and divide-by-zero, trivial-decimal short-circuit, the
C/F/K triangle, and the sig-fig DecimalFormat output shape."""

import math

import pytest

from marginalia_ray.query.eval import MathParser, Units


@pytest.fixture(scope="module")
def mp():
    return MathParser()


@pytest.fixture(scope="module")
def units(mp):
    return Units(mp)


class TestMathParser:
    # MathParserTest.parse vectors, with actual expected values
    @pytest.mark.parametrize(
        "expr,want",
        [
            ("3+5", 8.0),
            ("1+(300+log(5))", 301 + math.log(5)),
            ("sqrt(1+300)", math.sqrt(301)),
            ("sqrt(pi)", math.sqrt(math.pi)),
            ("3+5-5", 3.0),
            ("3+-5+5", 3.0),
            ("3+-5+log 5", -2 + math.log(5)),
            ("2^10", 1024.0),
            ("2+3*4", 14.0),
            ("(2+3)*4", 20.0),
            ("3.5*(2+5)", 24.5),
            ("2*pi", 2 * math.pi),
            ("e", math.e),
            ("3--5", 8.0),
            ("-pi", -math.pi),
            ("3*-2", -6.0),
            ("cos(0)", 1.0),
            ("3.5", 3.5),  # trivial short-circuit still evaluates
        ],
    )
    def test_eval(self, mp, expr, want):
        assert mp.eval(expr) == pytest.approx(want, rel=1e-12)

    def test_nan_cases(self, mp):
        assert math.isnan(mp.eval("log -5"))  # Math.log(-5) == NaN
        assert math.isnan(mp.eval("1/0"))  # MathParser returns NaN, not inf

    def test_trivial_decimal_formats_empty(self, mp):
        # MathParser.java:33-38 — bare decimals produce no answer box
        assert mp.eval_formatted("3.5") == ""
        assert mp.eval_formatted(".5") == ""
        assert mp.eval_formatted("3+5") == "8"

    def test_formatted_six_digits_half_up_grouping(self, mp):
        assert mp.eval_formatted("sqrt(pi)") == "1.772454"
        assert mp.eval_formatted("1+(300+log(5))") == "302.609438"
        assert mp.eval_formatted("1000000*3") == "3,000,000"

    def test_log10_unreachable_quirk(self, mp):
        # faithful quirk: the tokenizer splits alpha runs at digits, so
        # "log10"/"log2" tokenize as log + number and the reference's
        # log10/log2 function-table entries are unreachable — both
        # engines throw on the dangling group
        with pytest.raises(ValueError):
            mp.eval("log10(100)")

    def test_unbalanced_parens(self, mp):
        with pytest.raises(ValueError):
            mp.eval("(3+5")
        with pytest.raises(ValueError):
            mp.eval("3+5)")

    def test_malformed_number(self, mp):
        with pytest.raises(ValueError):
            mp.tokenize("3.5.5")

    def test_tokenize_shapes(self, mp):
        assert [t.type for t in mp.tokenize("3.5")] == ["0"]
        assert [t.type for t in mp.tokenize("(3.5 + 2)*3")] == [
            "(", "0", "+", "0", ")", "*", "0",
        ]
        assert [t.type for t in mp.tokenize("pi+log(2)")] == ["C", "+", "A", "(", "0", ")"]


class TestUnits:
    # UnitsTest vectors with actual expected numbers
    def test_distance(self, units):
        fu = units.units_by_name["cm"]
        tu = units.units_by_name["m"]
        assert units.convert_value(3.33, fu, tu) == pytest.approx(0.0333)
        assert units.convert("3.33", "cm", "m") == ".0333 m"

    def test_km_to_ft(self, units):
        v = units.convert_value(10, units.units_by_name["km"], units.units_by_name["ft"])
        assert v == pytest.approx(10000 / 0.3048)
        out = units.convert("10", "km", "ft")
        assert out is not None and out.endswith(" ft")
        assert out.split(" ")[0] == "32,808"

    def test_oz_to_tons(self, units):
        v = units.convert_value(10, units.units_by_name["oz"], units.units_by_name["tons"])
        assert v == pytest.approx(10 * 0.0283495231 / 1000)
        out = units.convert("10", "oz", "tons")
        assert out is not None and out.endswith(" metric tons")

    def test_parsec_to_inches(self, units):
        v = units.convert_value(10, units.units_by_name["pc"], units.units_by_name["in"])
        assert v == pytest.approx(10 * 30856775800000000 / 0.0254)

    # UnitsTest.convert5 — the full C/F/K triangle
    @pytest.mark.parametrize(
        "frm,to,want",
        [
            ("F", "K", 5 * (50 - 32) / 9 + 273.15),
            ("C", "K", 50 + 273.15),
            ("K", "F", 32 + 9 * (50 - 273.15) / 5),
            ("C", "F", 32 + 9 * 50 / 5),
            ("K", "C", 50 - 273.15),
            ("F", "C", 5 * (50 - 32) / 9),
        ],
    )
    def test_temperature_triangle(self, units, frm, to, want):
        v = units.convert_value(
            50, units.units_by_name[frm.lower()], units.units_by_name[to.lower()]
        )
        assert v == pytest.approx(want)

    def test_same_unit_echo(self, units):
        # Units.java:51-53: identical units echo the input value verbatim
        assert units.convert("50", "K", "K") == "50 K"
        assert units.convert("50", "kelvin", "k") == "50 K"

    def test_cross_type_refused(self, units):
        assert units.convert("10", "km", "kg") is None

    def test_unknown_unit(self, units):
        assert units.convert("10", "flubs", "m") is None
        assert units.convert("10", "flubs", "blorps") is None  # ref NPEs here

    def test_expression_value(self, units):
        # the VALUE goes through MathParser (Units.java:66)
        assert units.convert("2+1", "km", "m").endswith(" m")

    def test_garbage_value(self, units):
        assert units.convert("##", "km", "m") is None
