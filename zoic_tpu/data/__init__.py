"""Bundled lens prescription library.

Eight published lens designs (W. J. Smith, *Modern Lens Design*, McGraw-Hill
1992, plus lens patents) mirroring the reference's fixture set
(reference: lenses_tabular/*.dat; see SURVEY.md C23).  Metadata (EFL/BFL)
doubles as golden values for the focal-length solver tests.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

_HERE = os.path.dirname(__file__)


@dataclasses.dataclass(frozen=True)
class LensInfo:
    name: str
    path: str
    efl_mm: float                 # published effective focal length
    bfl_mm: Optional[float]       # published back focal length (if given)
    fstop: float                  # max numerical aperture
    elements: int                 # element rows incl. iris


def _p(fname: str) -> str:
    return os.path.join(_HERE, "lenses", fname)


LENSES: Dict[str, LensInfo] = {
    info.name: info
    for info in [
        LensInfo("petzval_f1.25", _p("petzval_f1.25.dat"), 99.5, 1.665, 1.25, 11),
        LensInfo("petzval_f1.6", _p("petzval_f1.6.dat"), 100.7, 15.72, 1.6, 8),
        LensInfo("double_gauss_f2.0", _p("double_gauss_f2.0.dat"), 100.0, None, 2.0, 11),
        LensInfo("triplet_f2.5", _p("triplet_f2.5.dat"), 99.58, 65.48, 2.5, 7),
        LensInfo("mori_f2.8", _p("mori_f2.8.dat"), 100.0, 129.3, 2.8, 11),
        LensInfo("tessar_f2.8", _p("tessar_f2.8.dat"), 100.0, 79.83, 2.8, 8),
        LensInfo("fisheye_muller_f4.0", _p("fisheye_muller_f4.0.dat"), 10.0, None, 4.0, 12),
        LensInfo("telephoto_f5.0", _p("telephoto_f5.0.dat"), 100.0, 42.9, 5.0, 9),
    ]
}


def lens_path(name: str) -> str:
    return LENSES[name].path
