"""Deterministic FIXTURES.md-style clinical raw tables (T1-T3 trimmed) with
planted defects and recorded expectations."""

from __future__ import annotations

STUDY_SCHEMA = (
    "`Płeć` string, `Rok urodzenia` string, `Data badania` string, "
    "`Data operacji` string, `SUV (max) w miejscu zapalenia` string, "
    "`SUV (max) tła` string, `tumor to background ratio` string, "
    "`Gorączka` string, `cukrzyca` string, `Rodzaj protezy` string, "
    "`uproszczona klasyfikacja` string, `tetniakPowodOper` int, "
    "`_c0` string, `rawcol92` string"
)

#: planted defects (exact expectations for the quality stage)
STUDY_EXPECT = {
    "n_rows_after_gate": 60,
    "nulls_suv_focus": 4,
    "range_suv_focus": 2,     # 95.5 and -3.0 outside [0, 70]
    "outliers_suv_focus": 1,  # single 400.0-like extreme after repair — see data
}


def study_rows():
    rows = []
    for i in range(60):
        suv = f"{4 + (i % 10)},{i % 100:02d}"  # comma decimals 4,00 .. 13,59
        if i in (5, 15, 25, 35):
            suv = None                          # planted NULLs (4)
        elif i == 45:
            suv = "95,5"                        # out of range high
        elif i == 55:
            suv = "-3,0"                        # out of range low
        elif i == 59:
            suv = "400,0"                       # extreme: range + z-score outlier
        rows.append(
            (
                "Kobieta" if i % 2 == 0 else "Mężczyzna",
                f"19{50 + i % 40:02d}-03-01",
                f"2015-{1 + i % 12:02d}-15",
                f"2014-{1 + i % 12:02d}-10",
                suv,
                f"1,{i % 9}",
                f"0,{i % 10}",
                "tak" if i % 3 == 0 else "nie",
                "Prawda" if i % 4 == 0 else "",
                "StentGraft" if i % 2 == 0 else "Proteza",
                "ob. nacz. biodrowe" if i % 2 == 0 else "aorty piersiowej",
                i % 2,
                None,
                str(1 + i % 5),
            )
        )
    # gated-out row (NULL gender)
    rows.append((None, "1950-01-01", "2015-01-01", "2014-01-01", "5,0", "1,0",
                 "0,5", "tak", "Prawda", "Proteza", "ob. nacz. biodrowe", 1, None, "3"))
    return rows


CONTROL_SCHEMA = (
    "`Płeć` string, `data badania 1` string, `Rok z peselu` int, "
    "`SUV protezy` string, `tło` string, `stentgraft czy proteza` string, "
    "`cukrzyca` int, `_c25` string"
)


def control_rows():
    rows = []
    for i in range(40):
        rows.append(
            (
                "Kobieta" if i % 3 == 0 else "Mężczyzna",
                f"2016-{1 + i % 12:02d}-20",
                1940 + i % 50,
                f"{2 + i % 6},{i % 10}",
                f"1,{1 + i % 8}",
                "stentgraft" if i % 2 == 0 else "proteza",
                i % 2,
                None,
            )
        )
    rows.append((None, None, 1950, "3,0", "1,5", "proteza", 0, None))  # gated out
    return rows
