"""Lens file parsing + cleanup golden tests.

Mirrors the reference's own console-log verification (SURVEY.md §4):
the parsed table, aperture detection, unit conversion and rear-shift are
checked against hand-derived values for the bundled prescriptions
(reference behavior: src/zoic.cpp:708-959)."""

import numpy as np
import pytest

import zoic_tpu.data as data
import zoic_tpu.lensfile as lensfile


@pytest.mark.parametrize("name", sorted(data.LENSES))
def test_parse_all_fixtures(name):
    info = data.LENSES[name]
    rx = lensfile.parse(info.path)
    assert rx.count == info.elements
    # rear-first ordering: element 0 is the LAST data row of the file
    assert rx.aperture_element == -1  # not yet assigned before cleanup


@pytest.mark.parametrize("name", sorted(data.LENSES))
def test_cleanup_all_fixtures(name):
    info = data.LENSES[name]
    rx = lensfile.load(info.path)
    assert rx.count == info.elements
    if name in ("petzval_f1.6", "telephoto_f5.0"):
        # no iris row in these prescriptions: defined as -1 (reference UB)
        assert rx.aperture_element == -1
    else:
        assert 0 <= rx.aperture_element < rx.count
        # flattened aperture ROC: 99999 mm -> 9999.9 cm
        assert rx.curvature[rx.aperture_element] == pytest.approx(9999.9, rel=1e-6)
    # no zero IORs remain
    assert np.all(rx.ior != 0.0)
    # stack shifted: total thickness sums to ~0 (rear element at origin)
    assert float(np.sum(rx.thickness, dtype=np.float64)) == pytest.approx(
        0.0, abs=1e-4
    )


def test_double_gauss_values():
    """Hand-checked numbers for the Double Gauss f/2.0 (MLD p.312).

    Raw file rows are front-first in mm; after parse+cleanup element 0 is
    the rear-most element in cm (reference zoic.cpp:913, 946-958)."""
    rx = lensfile.load(data.lens_path("double_gauss_f2.0"))
    assert rx.count == 11
    # rear element = last file row: ROC -79.46mm -> -7.946cm
    assert rx.curvature[0] == pytest.approx(-7.946, rel=1e-6)
    # front element = first file row: ROC 58.95mm -> 5.895cm
    assert rx.curvature[-1] == pytest.approx(5.895, rel=1e-6)
    # aperture row (0 ROC) is file row 6 of 11 -> reversed index 5
    assert rx.aperture_element == 5
    # rear thickness shifted by total stack length: 7.2228 - 13.685 (cm)
    total_raw_cm = 0.1 * (
        7.52 + 0.24 + 8.05 + 6.55 + 11.41 + 9.0 + 2.36 + 12.13 + 0.38 + 6.44 + 72.228
    )
    assert rx.thickness[0] == pytest.approx(7.2228 - total_raw_cm, rel=1e-5)
    # IOR zeros became 1.0 (this file uses explicit 1.0 except the iris row)
    assert rx.ior[rx.aperture_element] == 1.0


def test_mixed_delimiters_and_comments(tmp_path):
    """The reference accepts tab/comma/semicolon/colon/space and ``#``
    comments (zoic.cpp:724-728)."""
    f = tmp_path / "lens.dat"
    f.write_text("# hdr\n1.0,2.0;3.0:4.0\n5.0\t6.0 7.0 8.0\n\n# tail\n")
    rx = lensfile.parse(str(f))
    assert rx.count == 2
    # reversed: element 0 is the last row
    assert rx.curvature[0] == 5.0 and rx.curvature[1] == 1.0
    assert rx.aperture[0] == 8.0


def test_bad_column_counts(tmp_path):
    f3 = tmp_path / "bad3.dat"
    f3.write_text("1 2 3\n4 5 6\n")
    with pytest.raises(lensfile.LensFileError):
        lensfile.parse(str(f3))
    f6 = tmp_path / "bad6.dat"
    f6.write_text("1 2 3 4 5 6\n")
    with pytest.raises(lensfile.LensFileError):
        lensfile.parse(str(f6))


def test_multiple_apertures_rejected(tmp_path):
    f = tmp_path / "two_irises.dat"
    f.write_text("0 1 0 5\n10 1 1.5 5\n0 1 0 5\n")
    with pytest.raises(lensfile.LensFileError):
        lensfile.load(str(f))


def test_missing_lens_file_raises_lensfileerror():
    """Unreadable path -> LensFileError (the reference's render-abort
    class, zoic.cpp:1639-1641), not a raw OSError."""
    import pytest

    from zoic_tpu.lensfile import LensFileError, parse

    with pytest.raises(LensFileError):
        parse("/nonexistent/lens.dat")
