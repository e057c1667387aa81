"""Unit-conversion + math operators.

Pure Arrow-compute scalar arithmetic. Conversion constants reproduce the
reference classes *exactly* (each cited unit/*.java uses these literal
factors, e.g. FootToMeter.java: value/3.2808, golden 0.30480370641307 at
FootToMeterTest.java:16)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .registry import register_op

# (name, kind, factor): kind 'mul' → value*f, 'div' → value/f — kept as the
# reference wrote them so float results match bit-for-bit.
_CONVERSIONS = [
    ("centimeter_to_meter", "div", 100.0),        # CentimeterToMeter.java
    ("chain_to_meter", "mul", 0.049710),          # ChainToMeter.java
    ("decimeter_to_meter", "div", 10.0),          # DecimeterToMeter.java
    ("fathom_to_meter", "div", 0.5468066492),     # FathomToMeter.java
    ("foot_to_meter", "div", 3.2808),             # FootToMeter.java
    ("inch_to_meter", "mul", 0.0254),             # InchToMeter.java
    ("kilometer_to_meter", "mul", 1000.0),        # KilometerToMeter.java
    ("link_to_meter", "mul", 0.201168),           # LinkToMeter.java
    ("meter_to_centimeter", "mul", 100.0),        # MeterToCentimeter.java
    ("meter_to_chain", "div", 0.049710),          # MeterToChain.java
    ("meter_to_decimeter", "mul", 10.0),          # MeterToDecimeter.java
    ("meter_to_fathom", "mul", 0.5468066492),     # MeterToFathom.java
    ("meter_to_foot", "mul", 3.2808),             # MeterToFoot.java
    ("meter_to_inch", "div", 0.0254),             # MeterToInch.java
    ("meter_to_kilometer", "div", 1000.0),        # MeterToKilometer.java
    ("meter_to_link", "div", 0.201168),           # MeterToLink.java
    ("meter_to_mile", "mul", 0.00062137),         # MeterToMile.java
    ("meter_to_millimeter", "mul", 1000.0),       # MeterToMillimeter.java
    ("meter_to_nauticalmile", "div", 1852.0),     # MeterToNauticalMile.java
    ("meter_to_usfoot", "mul", 3.28083333),       # MeterToUSFoot.java
    ("meter_to_usinch", "mul", 39.37),            # MeterToUSInch.java
    ("meter_to_usmile", "mul", 0.0006213699),     # MeterToUSMile.java
    ("meter_to_usyard", "mul", 1.094),            # MeterToUSYard.java
    ("meter_to_yard", "mul", 1.0936),             # MeterToYard.java
    ("mile_to_meter", "div", 0.00062137),         # MileToMeter.java
    ("millimeter_to_meter", "div", 1000.0),       # MillimeterToMeter.java
    ("nauticalmile_to_meter", "mul", 1852.0),     # NauticalMileToMeter.java
    ("usfoot_to_meter", "div", 3.28083333),       # USFootToMeter.java
    ("usinch_to_meter", "mul", 0.0254000508),     # USInchToMeter.java
    ("usmile_to_meter", "div", 0.0006213699),     # USMileToMeter.java
    ("usyard_to_meter", "div", 1.094),            # USYardToMeter.java
    ("yard_to_meter", "div", 1.0936),             # YardToMeter.java
]


def _make(name, kind, factor):
    if kind == "mul":
        def fn(col, _f=factor):
            return pc.multiply(pc.cast(col, pa.float64()), _f)
    else:
        def fn(col, _f=factor):
            return pc.divide(pc.cast(col, pa.float64()), _f)
    fn.__doc__ = f"unit/{name}: value {'*' if kind == 'mul' else '/'} {factor}"
    register_op(name, 1, "unit")(fn)
    return fn


for _n, _k, _f in _CONVERSIONS:
    _make(_n, _k, _f)


@register_op("to_degrees", 1, "math")
def to_degrees(col):
    """math/ToDegrees.java:6."""
    import math
    return pc.multiply(pc.cast(col, pa.float64()), 180.0 / math.pi)


@register_op("to_radians", 1, "math")
def to_radians(col):
    """math/ToRadians.java:6."""
    import math
    return pc.multiply(pc.cast(col, pa.float64()), math.pi / 180.0)
