"""Enums shared by the meta-blocking pruners.

Reference parity: python/sparker/pruning_utils.py:1-26 — identical
string values so ported notebooks keep working.
"""


class WeightTypes:
    CBS = "cbs"
    JS = "js"
    CHI_SQUARE = "chi_square"
    ARCS = "arcs"
    ECBS = "ecbs"
    EJS = "ejs"

    ALL = [CBS, JS, CHI_SQUARE, ARCS, ECBS, EJS]


class ThresholdTypes:
    MAX_FRACT_2 = "maxdiv2"
    AVG = "avg"


class ComparisonTypes:
    AND = "and"
    OR = "or"
