"""Public FIT-profile data tables shared by the FIT parser/encoder.

All content here is factual data from the PUBLIC Garmin FIT SDK
profile (manufacturer enum, message field numbers) — the same public
source the reference's tables are generated from
(``/root/reference/lib/src/models.dart:40-220`` cites the identical
list). Kept in one module so parser, encoder and validator (V6
name<->id checks) resolve from a single copy.
"""

from __future__ import annotations

# FIT manufacturer id -> display name (public FIT SDK manufacturer
# enum; used both directions: parse resolves ids to names for device
# metadata, encode maps stored names back to wire ids —
# fit_parser.dart:526-529 / fit_encoder.dart:688-702 parity).
MANUFACTURERS: dict[int, str] = {
    1: "Garmin",
    2: "Garmin FR405 ANTFS",
    3: "Zephyr",
    4: "Dayton",
    5: "IDT",
    6: "SRM",
    7: "Quarq",
    8: "iBike",
    9: "Saris",
    10: "Spark HK",
    11: "Tanita",
    12: "Echowell",
    13: "Dynastream OEM",
    14: "Nautilus",
    15: "Dynastream",
    16: "Timex",
    17: "Metrigear",
    18: "Xelic",
    19: "Beurer",
    20: "Cardiosport",
    21: "A&D",
    22: "HMM",
    23: "Suunto",
    24: "Thita Elektronik",
    25: "GPulse",
    26: "Clean Mobile",
    27: "Pedal Brain",
    28: "Peaksware",
    29: "Saxonar",
    30: "LeMond Fitness",
    31: "Dexcom",
    32: "Wahoo Fitness",
    33: "Octane Fitness",
    34: "Archinoetics",
    35: "The Hurt Box",
    36: "Citizen Systems",
    37: "Magellan",
    38: "Osynce",
    39: "Holux",
    40: "Concept2",
    42: "One Giant Leap",
    43: "Ace Sensor",
    44: "Brim Brothers",
    45: "Xplova",
    46: "Perception Digital",
    47: "BF1systems",
    48: "Pioneer",
    49: "Spantec",
    50: "Metalogics",
    51: "4iiiis",
    52: "Seiko Epson",
    53: "Seiko Epson OEM",
    54: "Ifor Powell",
    55: "Maxwell Guider",
    56: "Star Trac",
    57: "Breakaway",
    58: "Alatech Technology Ltd",
    59: "MIO Technology Europe",
    60: "Rotor",
    61: "Geonaute",
    62: "ID Bike",
    63: "Specialized",
    64: "Wtek",
    65: "Physical Enterprises",
    66: "North Pole Engineering",
    67: "Bkool",
    68: "Cateye",
    69: "Stages Cycling",
    70: "Sigmasport",
    71: "TomTom",
    72: "Peripedal",
    73: "Wattbike",
    76: "Moxy",
    77: "Ciclosport",
    78: "Powerbahn",
    79: "Acorn Projects APS",
    80: "Lifebeam",
    81: "Bontrager",
    82: "Wellgo",
    83: "Scosche",
    84: "Magura",
    85: "Woodway",
    86: "Elite",
    87: "Nielsen Kellerman",
    88: "DK City",
    89: "Tacx",
    90: "Direction Technology",
    91: "Magtonic",
    92: "1partCarbon",
    93: "Inside Ride Technologies",
    94: "Sound Of Motion",
    95: "Stryd",
    96: "ICG",
    97: "MiPulse",
    98: "BSX Athletics",
    99: "Look",
    100: "Campagnolo SRL",
    101: "Body Bike Smart",
    102: "Praxisworks",
    103: "Limits Technology",
    104: "Topaction Technology",
    105: "Cosinuss",
    106: "Fitcare",
    107: "Magene",
    108: "Giant Manufacturing Co",
    109: "Tigrasport",
    110: "Salutron",
    111: "Technogym",
    112: "Bryton Sensors",
    113: "Latitude Limited",
    114: "Soaring Technology",
    115: "Igpsport",
    116: "Thinkrider",
    117: "Gopher Sport",
    118: "Waterrower",
    119: "Orangetheory",
    120: "Inpeak",
    121: "Kinetic",
    122: "Johnson Health Tech",
    123: "Polar Electro",
    124: "Seesense",
    125: "NCI Technology",
    126: "iQsquare",
    127: "Leomo",
    128: "iFit.com",
    129: "Coros Byte",
    130: "Versa Design",
    131: "Chileaf",
    132: "Cycplus",
    255: "Development",
    257: "Healthandlife",
    258: "Lezyne",
    259: "Scribe Labs",
    260: "Zwift",
    261: "Watteam",
    262: "Recon",
    263: "Favero Electronics",
    264: "Dynovelo",
    265: "Strava",
    266: "Precor",
    267: "Bryton",
    268: "SRAM",
    269: "Navman",
    270: "Cobi",
    271: "Spivi",
    272: "MIO Magellan",
    273: "Evesports",
    274: "Sensitivus Gauge",
    275: "Podoon",
    276: "Life Time Fitness",
    277: "Falco e-Motors",
    278: "Minoura",
    279: "Cycliq",
    280: "Luxottica",
    281: "TrainerRoad",
    282: "The Sufferfest",
    283: "Fullspeedahead",
    284: "Virtualtraining",
    285: "Feedbacksports",
    286: "Omata",
    287: "VDO",
    288: "Magneticdays",
    289: "Hammerhead",
    290: "Kinetic by Kurt",
    291: "Shapelog",
    292: "Dabuziduo",
    293: "Jetblack",
    294: "Coros",
    295: "Virtugo",
    296: "Velosense",
    297: "Cycligentinc",
    298: "Trailforks",
    299: "Mahle Ebikemotion",
    300: "Nurvv",
    301: "Microprogram",
    302: "Zone5cloud",
    303: "Greenteg",
    304: "Yamaha Motors",
    5759: "Actigraphcorp",
}

_NAME_TO_ID = {v.lower(): k for k, v in MANUFACTURERS.items()}


def manufacturer_name(mid: int | None) -> str | None:
    """id -> known name, else ``manufacturer_<id>`` (parser behavior,
    fit_parser.dart:526-529 analog)."""
    if mid is None:
        return None
    return MANUFACTURERS.get(int(mid), f"manufacturer_{int(mid)}")


def manufacturer_id(name: str | None) -> int | None:
    """Case-insensitive name -> id; falls back to parsing a numeric
    string (fit_encoder.dart:688-702 analog)."""
    if name is None:
        return None
    normalized = name.strip().lower()
    if not normalized:
        return None
    mid = _NAME_TO_ID.get(normalized)
    if mid is not None:
        return mid
    if normalized.startswith("manufacturer_"):
        normalized = normalized[len("manufacturer_"):]
    try:
        return int(normalized)
    except ValueError:
        return None


# Field numbers with dedicated handling per message (public FIT
# profile). Anything numeric OUTSIDE these sets is preserved raw in
# the span's extra_fields / extra_arrays maps so no metric is
# silently dropped (fit_parser.dart:1033-1089 semantics).
#
# Session note: the profile's start_time (2) is dedicated HERE
# (span rows carry absolute start); the reference models session
# timing as durations only and lets 2 fall through to extras — both
# preserve the value on a FIT->FIT round-trip.
DEDICATED_SESSION_FIELDS = frozenset({
    253, 254, 2,            # timestamps, start_time
    5, 6,                   # sport, sub_sport
    7, 8, 9, 10, 11,        # elapsed, timer, distance, cycles, calories
    14, 15, 16, 17, 18, 19, 20, 21,  # avg/max speed, hr, cadence, power
    41, 43, 44, 47,         # avg_stroke_count, swim_stroke, pool_length, active_lengths
})

# Lap note: sport (25) is dedicated here (span rows carry per-lap
# sport, encoded natively at 25); the reference leaves 25 to extras.
DEDICATED_LAP_FIELDS = frozenset({
    253, 254,               # timestamps
    0, 1, 2,                # event, event_type, start_time
    7, 9, 11,               # elapsed, distance, calories
    13, 14, 15, 16, 17, 18, 19, 20,  # avg/max speed, hr, cadence, power
    25,                     # sport
    38, 40,                 # swim_stroke, num_active_lengths
})

# Record (global 20) fields decoded into named channels; unknown
# numeric native record fields become ``fit_field_<n>`` channels
# (fit_parser.dart:1025-1031 semantics; 78 here is enhanced_altitude
# per the public profile).
DEDICATED_RECORD_FIELDS = frozenset({
    253,                    # timestamp
    0, 1, 2, 78,            # position, altitude, enhanced_altitude
    3, 4, 5, 6, 73, 7, 13,  # hr, cadence, distance, speed, enh_speed, power, temp
    8,                      # compressed_speed_distance (-> speed+distance)
    120,                    # left_right_balance (named channel)
})
