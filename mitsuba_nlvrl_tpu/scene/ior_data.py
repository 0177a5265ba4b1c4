"""Named IOR lookup (reference data/ior/*.spd + bsdfs docs table).

Standard material IOR values (public physical constants) used when scene
files specify e.g. int_ior="bk7".
"""

IOR_TABLE = {
    'vacuum': 1.0,
    'helium': 1.000036,
    'hydrogen': 1.000132,
    'air': 1.000277,
    'carbon dioxide': 1.00045,
    'water': 1.3330,
    'acetone': 1.36,
    'ethanol': 1.361,
    'carbon tetrachloride': 1.461,
    'glycerol': 1.4729,
    'benzene': 1.501,
    'silicone oil': 1.52045,
    'bromine': 1.661,
    'water ice': 1.31,
    'fused quartz': 1.458,
    'pyrex': 1.470,
    'acrylic glass': 1.49,
    'polypropylene': 1.49,
    'bk7': 1.5046,
    'sodium chloride': 1.544,
    'amber': 1.55,
    'pet': 1.5750,
    'diamond': 2.419,
}


def lookup_ior(name):
    if isinstance(name, (int, float)):
        return float(name)
    try:
        return float(name)
    except ValueError:
        pass
    key = name.strip().lower()
    if key not in IOR_TABLE:
        raise KeyError(f"unknown IOR material {name!r}")
    return IOR_TABLE[key]
