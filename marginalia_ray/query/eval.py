"""Search-box expression evaluation + unit conversion — the reference's
assistant-service eval pair (MathParser.java, Units.java + units.csv).

MathParser is the reference's layered token rewriter, not a textbook
Pratt parser: tokenize, then rewrite passes in its exact order —
parenthesize -> unary-minus fold -> function application -> '^' ->
'*/' -> '+-' (MathParser.java:41-58) — so expression corner cases
agree: ``3+-5+log 5`` binds the minus as negation after '+', ``log -5``
evaluates to NaN (math.log of a negative), and a *trivial* decimal
string ("3.5") formats to "" (MathParser.java:33-38).

Units mirrors Units.java:47-121: same-unit echo, cross-type refusal,
linear conversions through the base-value table (the public conversion
constants of units.csv), the three-way C/F/K temperature special case,
and the significant-figure output formatting — maximumIntegerDigits =
1 + (int)log10(|v|) and maximumFractionDigits = 1 + sigfigs -
(int)log10(|v|), with DecimalFormat's grouping commas, HALF_EVEN
rounding and leading-zero suppression (".0333 m").  Deviation: when
BOTH unit names are unknown the reference NPEs on fromUnit.name; here
it returns None.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_EVEN, ROUND_HALF_UP, Decimal

_CONSTANTS = {"e": math.e, "pi": math.pi, "2pi": 2 * math.pi}

_FUNCTIONS = {
    "sqrt": math.sqrt,
    "log": math.log,
    "log10": math.log10,
    "log2": lambda v: math.log(v) / math.log(2),
    "cos": math.cos,
    "sin": math.sin,
    "tan": math.tan,
}


class _Tok:
    __slots__ = ("type", "value", "args")

    def __init__(self, type_: str, value=None, args=None):
        self.type = type_
        self.value = value
        self.args = args  # list for groups, tuple for uni/bi expressions

    def __repr__(self):
        if self.args is not None:
            return f"({self.type} {self.args})"
        return f"{self.type}:{self.value}" if self.value is not None else self.type


class MathParser:
    """MathParser.java — see module docstring for the pass order."""

    def _is_trivial(self, s: str) -> bool:
        # "([0-9]+\.[0-9]*|\.[0-9]+)" full match (MathParser.java:25)
        import re

        return re.fullmatch(r"[0-9]+\.[0-9]*|\.[0-9]+", s) is not None

    def tokenize(self, s: str) -> list[_Tok]:
        toks: list[_Tok] = []
        i = 0
        while i < len(s):
            c = s[i]
            if c in "()+-/*^":
                toks.append(_Tok(c))
                i += 1
            elif c.isdigit():
                j = i + 1
                has_period = False
                while j < len(s):
                    if s[j].isdigit():
                        j += 1
                    elif s[j] == "." and not has_period:
                        has_period = True
                        j += 1
                    elif s[j] == ".":
                        raise ValueError(f"Malformatted number in {s!r} at {j}")
                    else:
                        break
                toks.append(_Tok("0", s[i:j]))
                i = j
            elif c.isalpha():
                j = i + 1
                while j < len(s) and s[j].isalpha():
                    j += 1
                word = s[i:j]
                toks.append(_Tok("C" if word in _CONSTANTS else "A", word))
                i = j
            elif c == " ":
                i += 1
            else:
                raise ValueError(f"Unparseable character {c!r} in {s!r}")
        return toks

    def parenthesize(self, toks: list[_Tok]) -> list[_Tok]:
        out = list(toks)
        i = 0
        while i < len(out):
            t = out[i]
            if t.type == ")":
                raise ValueError("Unbalanced parentheses")
            if t.type == "(":
                depth = 0
                j = i + 1
                while j < len(out):
                    if out[j].type == "(":
                        depth += 1
                    elif out[j].type == ")":
                        if depth == 0:
                            break
                        depth -= 1
                    j += 1
                if j == len(out):
                    raise ValueError("Unbalanced parentheses")
                out[i : j + 1] = [_Tok(" ", args=self.parenthesize(out[i + 1 : j]))]
            i += 1
        return out

    def _map_children(self, toks: list[_Tok], fn) -> None:
        for t in toks:
            if t.type == " ":
                t.args = fn(t.args)
            elif t.args is not None:
                self._map_children(list(t.args), fn)

    def _negate(self, toks: list[_Tok]) -> list[_Tok]:
        self._map_children(toks, self._negate)
        i = 0
        while i < len(toks) - 1:
            if toks[i].type != "-":
                i += 1
                continue
            if i == 0 or toks[i - 1].type in "+-%*/A":
                toks[i : i + 2] = [_Tok("~", args=(toks[i + 1],))]
                continue
            i += 1
        return toks

    def _functions(self, toks: list[_Tok]) -> list[_Tok]:
        self._map_children(toks, self._functions)
        i = 0
        while i < len(toks) - 1:
            if toks[i].type == "A":
                toks[i : i + 2] = [_Tok("F", args=(toks[i], toks[i + 1]))]
            else:
                i += 1
        return toks

    def _binary(self, toks: list[_Tok], operators: str) -> list[_Tok]:
        self._map_children(toks, lambda ts: self._binary(ts, operators))
        i = 1
        while i < len(toks) - 1:
            t = toks[i]
            if t.type in operators and t.value is None and t.args is None:
                toks[i - 1 : i + 2] = [_Tok(t.type, args=(toks[i - 1], toks[i + 1]))]
                i -= 1
                continue
            i += 1
        return toks

    def _evaluate(self, t: _Tok) -> float:
        if t.type == "0":
            return float(t.value)
        if t.type == "C":
            return _CONSTANTS[t.value]
        if t.type == "~":
            return -self._evaluate(t.args[0])
        if t.type == " ":
            if len(t.args) == 1:
                return self._evaluate(t.args[0])
            raise ValueError(f"Can't evaluate group {t!r}")
        if t.type == "F":
            name = t.args[0].value.lower()
            fn = _FUNCTIONS.get(name)
            if fn is None:
                raise ValueError(f"Unknown function {name!r}")
            v = self._evaluate(t.args[1])
            try:
                return fn(v)
            except ValueError:
                return float("nan")  # Java Math.log(-5) == NaN
        if t.type in "+-*/%^" and t.args is not None:
            left, right = t.args
            rv = self._evaluate(right)
            if t.type == "+":
                return self._evaluate(left) + rv
            if t.type == "-":
                return self._evaluate(left) - rv
            if t.type == "*":
                return self._evaluate(left) * rv
            if t.type == "/":
                return float("nan") if rv == 0 else self._evaluate(left) / rv
            if t.type == "%":
                return float("nan") if rv == 0 else math.fmod(self._evaluate(left), rv)
            if t.type == "^":
                return self._evaluate(left) ** rv
        raise ValueError(f"Can't evaluate {t!r}")

    def eval(self, expr: str) -> float:
        if self._is_trivial(expr):
            return float(expr)
        toks = self.tokenize(expr)
        toks = self.parenthesize(toks)
        toks = self._negate(toks)
        toks = self._functions(toks)
        toks = self._binary(toks, "^")
        toks = self._binary(toks, "*/")
        toks = self._binary(toks, "+-")
        return self._evaluate(_Tok(" ", args=toks))

    def eval_formatted(self, expr: str) -> str:
        """DecimalFormat.getInstance(Locale.US), HALF_UP, <=6 fraction
        digits, grouping commas, trailing zeros stripped."""
        if self._is_trivial(expr):
            return ""
        v = self.eval(expr)
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "-∞" if v < 0 else "∞"
        q = Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        s = f"{q:,f}".rstrip("0").rstrip(".")
        return s if s not in ("", "-") else "0"


# units.csv (assistant-service resources) — (base_value, type, names...);
# the FIRST name is the display name, all names are lookup aliases.
_UNITS_TABLE: list[tuple[float, str, tuple[str, ...]]] = [
    (30856775800000000, "DISTANCE", ("pc", "parsec", "parsecs")),
    (9460500000000000, "DISTANCE", ("ly", "light years", "light year")),
    (149597870700, "DISTANCE", ("au", "astronomical unit")),
    (1000, "DISTANCE", ("km", "kilometers", "kilometer")),
    (1, "DISTANCE", ("m", "meters", "meter")),
    (0.1, "DISTANCE", ("dm", "decimeters", "decimeter")),
    (0.01, "DISTANCE", ("cm", "centimeters", "centimeter")),
    (0.001, "DISTANCE", ("mm", "millimeters", "millimeter")),
    (0.9144, "DISTANCE", ("yd", "yards", "yard")),
    (0.0254, "DISTANCE", ("in", "inches", "inch")),
    (0.3048, "DISTANCE", ("ft", "feet", "foot")),
    (1609.344, "DISTANCE", ("miles", "mile")),
    (1852, "DISTANCE", ("nautical miles", "nautical mile")),
    (201.168, "DISTANCE", ("furlong", "furlongs")),
    (1, "WEIGHT", ("kg", "kilograms", "kilogram")),
    (0.001, "WEIGHT", ("g", "grams", "gram")),
    (1000, "WEIGHT", ("metric tons", "ton", "tons", "tonne", "tonnes")),
    (907.185, "WEIGHT", ("short tons", "short ton", "imperial ton", "imperial tons")),
    (0.45359237, "WEIGHT", ("lb", "lbs", "pounds")),
    (0.0283495231, "WEIGHT", ("oz", "ounces", "ounce")),
    (1, "AREA", ("m^2", "square meters", "square meter")),
    (0.01, "AREA", ("dm^2", "square decimeters", "square decimeter")),
    (0.0001, "AREA", ("cm^2", "square centimeters", "square centimeter")),
    (0.000001, "AREA", ("mm^2", "square millimeters", "square millimeter")),
    (1000000, "AREA", ("km^2", "square kilometers", "square kilometer")),
    (4046.9, "AREA", ("ac", "acre", "acres")),
    (2589988.1103360, "AREA", ("sq mi", "mi^2", "square miles", "square mile")),
    (258.99881103360, "AREA", ("hectares", "hectare")),
    (0.09290304, "AREA", ("ft^2", "square foot", "square feet")),
    (0.83612736, "AREA", ("yd^2", "square yard", "square yards")),
    (0.00064516, "AREA", ("in^2", "square inch", "square inches")),
    (1, "VOLUME", ("m^3", "cubic meter", "cubic meters")),
    (1000000000, "VOLUME", ("km^3", "cubic kilometer", "cubic kilometers")),
    (0.001, "VOLUME", ("L", "l", "dm^3", "liter", "liters", "cubic decimeter")),
    (0.0001, "VOLUME", ("dl", "deciliter", "deciliters")),
    (0.0001, "VOLUME", ("cl", "centiliter", "centiliters")),
    (0.00001, "VOLUME", ("ml", "milliliter", "milliliters")),
    (0.000001, "VOLUME", ("cm^3", "cc", "cubic centimeter", "cubic centimeters")),
    (0.000000001, "VOLUME", ("mm^3", "cubic millimeter", "cubic millimeters")),
    (0.000236588237, "VOLUME", ("us cup", "cup", "cups")),
    (0.0000295735296, "VOLUME", ("fl.oz.", "fl oz", "fluid ounces", "fluid ounce")),
    (0.028316846592, "VOLUME", ("ft^3", "cubic foot", "cubic feet")),
    (0.000016387064, "VOLUME", ("in^3", "cubic inch", "cubic inches")),
    (0.764554857984, "VOLUME", ("yd^3", "cubic yard", "cubic yards")),
    (0.000473176473, "VOLUME", ("US pint", "pint", "pints")),
    (0.00378541178, "VOLUME", ("gallon", "gallons")),
    (1, "TEMPERATURE", ("C", "c", "celsius", "centigrade")),
    (0, "TEMPERATURE", ("F", "f", "fahrenheit")),
    (0, "TEMPERATURE", ("K", "k", "kelvin", "kelvins")),
    (1, "TIME", ("S", "s", "second", "seconds")),
    (0.001, "TIME", ("ms", "millisecond")),
    (60, "TIME", ("min", "minutes")),
    (3600, "TIME", ("hour", "hours")),
    (864000, "TIME", ("day", "days")),  # sic — units.csv says 864000
    (604800, "TIME", ("week", "weeks")),
    (31557600.0, "TIME", ("year", "years")),
    (315576000.0, "TIME", ("decade", "decades")),
    (3155760000.0, "TIME", ("century", "centuries")),
    (1, "ANGLE", ("degree", "degrees")),
    (57.2957795, "ANGLE", ("radians", "radian")),
]


class Unit:
    __slots__ = ("name", "type", "base_value")

    def __init__(self, type_: str, base_value: float, name: str):
        self.type = type_
        self.base_value = base_value
        self.name = name


class Units:
    """Units.java — conversion + significant-figure formatting."""

    def __init__(self, math_parser: MathParser | None = None):
        self.math_parser = math_parser or MathParser()
        self.units_by_name: dict[str, Unit] = {}
        for base, type_, names in _UNITS_TABLE:
            u = Unit(type_, float(base), names[0])
            for n in names:
                self.units_by_name[n.lower()] = u

    def convert_value(self, val: float, from_unit: Unit, to_unit: Unit) -> float:
        if from_unit.type == "TEMPERATURE":
            return self._convert_temperature(val, from_unit, to_unit)
        return from_unit.base_value * val / to_unit.base_value

    def convert(self, value: str, from_name: str, to_name: str) -> str | None:
        fu = self.units_by_name.get(from_name.lower())
        tu = self.units_by_name.get(to_name.lower())
        if fu is None or tu is None:
            # (deviation: the reference NPEs when BOTH are unknown)
            return None
        if fu is tu:
            return f"{value} {fu.name}"
        if fu.type != tu.type:
            return None
        try:
            val = self.math_parser.eval(value)
        except Exception:
            return None
        converted = self.convert_value(val, fu, tu)
        negative = converted < 0
        if negative:
            converted = -converted
        # (int) cast truncates toward zero, exactly as Units.java:83
        int_fraction = int(math.log10(converted)) if converted > 0 else 0
        sig_figs = sum(ch.isdigit() for ch in value)
        max_int = 1 + int_fraction
        max_frac = max(0, 1 + sig_figs - int_fraction)
        return ("-" if negative else "") + self._decimal_format(
            converted, max_int, max_frac
        ) + " " + tu.name

    @staticmethod
    def _convert_temperature(v: float, fu: Unit, tu: Unit) -> float:
        pair = (fu.name, tu.name)
        if pair == ("C", "K"):
            return v + 273.15
        if pair == ("C", "F"):
            return 32.0 + 9 * v / 5
        if pair == ("F", "C"):
            return 5 * (v - 32.0) / 9
        if pair == ("F", "K"):
            return 5 * (v - 32.0) / 9 + 273.15
        if pair == ("K", "C"):
            return v - 273.15
        if pair == ("K", "F"):
            return 32.0 + 9 * (v - 273.15) / 5
        return 0.0  # Units.java:118 falls through to 0

    @staticmethod
    def _decimal_format(v: float, max_int: int, max_frac: int) -> str:
        """java.text.DecimalFormat(): grouping commas, HALF_EVEN, at most
        max_int integer digits (HIGH-order digits beyond that are
        dropped) and max_frac fraction digits, trailing zeros and a lone
        leading zero suppressed ('.0333')."""
        q = Decimal(repr(v)).quantize(
            Decimal(1).scaleb(-max_frac), rounding=ROUND_HALF_EVEN
        )
        s = f"{q:f}"
        int_part, _, frac_part = s.partition(".")
        if len(int_part) > max_int:
            int_part = int_part[len(int_part) - max_int :] if max_int > 0 else ""
        frac_part = frac_part.rstrip("0")
        if int_part:
            int_part = f"{int(int_part):,d}"
        out = int_part
        if frac_part:
            out += "." + frac_part
        return out if out else "0"
