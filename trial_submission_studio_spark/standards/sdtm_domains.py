"""SDTM domain/variable registry — S6 (SURVEY.md §2.1).

The reference embeds the full SDTM-IG v3.4 Datasets/Variables CSVs
(tss-standards/src/sdtm_ig.rs:25-189; 63 datasets / 1,917 variables).
This module ships a compact registry of the most-used domains,
hand-written from public CDISC SDTM-IG knowledge (NOT copied from the
reference's data files), in the same shape the plan compiler and
Define-XML writer consume. A production deployment would load the
full IG CSVs through :func:`load_registry_csv` — same schema, larger
file.

Variable dicts carry the fields the engine uses: name, label, core
(Req/Exp/Perm), data_type (Char/Num), role, codelist_code, order.
"""

from __future__ import annotations

import csv
import io


def _v(name, label, core="Perm", data_type="Char", role="", codelist="", length=None):
    return {
        "name": name,
        "label": label,
        "core": core,
        "data_type": data_type,
        "role": role,
        "codelist_code": codelist,
        "length": length,
    }


def _identifiers(domain: str) -> list[dict]:
    return [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("DOMAIN", "Domain Abbreviation", "Req", role="Identifier"),
        _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
        _v(f"{domain}SEQ", "Sequence Number", "Req", "Num", role="Identifier"),
    ]


DOMAINS: dict[str, dict] = {
    "DM": {
        "label": "Demographics",
        "class": "Special Purpose",
        "structure": "One record per subject",
        "variables": [
            _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
            _v("DOMAIN", "Domain Abbreviation", "Req", role="Identifier"),
            _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
            _v("SUBJID", "Subject Identifier for the Study", "Req", role="Topic"),
            _v("RFSTDTC", "Subject Reference Start Date/Time", "Exp"),
            _v("RFENDTC", "Subject Reference End Date/Time", "Exp"),
            _v("RFICDTC", "Date/Time of Informed Consent", "Exp"),
            _v("BRTHDTC", "Date/Time of Birth", "Perm"),
            _v("AGE", "Age", "Exp", "Num"),
            _v("AGEU", "Age Units", "Exp", codelist="C66781"),
            _v("SEX", "Sex", "Req", codelist="C66731"),
            _v("RACE", "Race", "Exp", codelist="C74457"),
            _v("ETHNIC", "Ethnicity", "Perm", codelist="C66790"),
            _v("ARMCD", "Planned Arm Code", "Exp"),
            _v("ARM", "Description of Planned Arm", "Exp"),
            _v("COUNTRY", "Country", "Req"),
        ],
    },
    "AE": {
        "label": "Adverse Events",
        "class": "Events",
        "structure": "One record per adverse event per subject",
        "variables": _identifiers("AE")
        + [
            _v("AETERM", "Reported Term for the Adverse Event", "Req", role="Topic"),
            _v("AEDECOD", "Dictionary-Derived Term", "Req"),
            _v("AESEV", "Severity/Intensity", "Perm", codelist="C66769"),
            _v("AESER", "Serious Event", "Exp", codelist="C66742"),
            _v("AEREL", "Causality", "Exp"),
            _v("AEOUT", "Outcome of Adverse Event", "Perm", codelist="C66768"),
            _v("AESTDTC", "Start Date/Time of Adverse Event", "Exp"),
            _v("AEENDTC", "End Date/Time of Adverse Event", "Perm"),
            _v("AESTDY", "Study Day of Start of Adverse Event", "Perm", "Num"),
            _v("AEENDY", "Study Day of End of Adverse Event", "Perm", "Num"),
            _v("AEDUR", "Duration of Adverse Event", "Perm"),
        ],
    },
    "VS": {
        "label": "Vital Signs",
        "class": "Findings",
        "structure": "One record per vital sign measurement per visit per subject",
        "variables": _identifiers("VS")
        + [
            _v("VSTESTCD", "Vital Signs Test Short Name", "Req", role="Topic", codelist="C66741"),
            _v("VSTEST", "Vital Signs Test Name", "Req"),
            _v("VSORRES", "Result or Finding in Original Units", "Exp"),
            _v("VSORRESU", "Original Units", "Exp", codelist="C66770"),
            _v("VSSTRESC", "Character Result/Finding in Std Format", "Exp"),
            _v("VSSTRESN", "Numeric Result/Finding in Standard Units", "Exp", "Num"),
            _v("VSSTRESU", "Standard Units", "Exp", codelist="C66770"),
            _v("VSPOS", "Vital Signs Position of Subject", "Perm", codelist="C71148"),
            _v("VSDTC", "Date/Time of Measurements", "Exp"),
            _v("VSDY", "Study Day of Vital Signs", "Perm", "Num"),
        ],
    },
    "LB": {
        "label": "Laboratory Test Results",
        "class": "Findings",
        "structure": "One record per lab test per specimen per visit per subject",
        "variables": _identifiers("LB")
        + [
            _v("LBTESTCD", "Lab Test or Examination Short Name", "Req", role="Topic"),
            _v("LBTEST", "Lab Test or Examination Name", "Req"),
            _v("LBORRES", "Result or Finding in Original Units", "Exp"),
            _v("LBORRESU", "Original Units", "Exp", codelist="C71620"),
            _v("LBSTRESN", "Numeric Result/Finding in Standard Units", "Exp", "Num"),
            _v("LBDTC", "Date/Time of Specimen Collection", "Exp"),
            _v("LBDY", "Study Day of Specimen Collection", "Perm", "Num"),
        ],
    },
    "CM": {
        "label": "Concomitant/Prior Medications",
        "class": "Interventions",
        "structure": "One record per recorded medication occurrence or constant-dosing interval per subject",
        "variables": _identifiers("CM")
        + [
            _v("CMTRT", "Reported Name of Drug, Med, or Therapy", "Req", role="Topic"),
            _v("CMDECOD", "Standardized Medication Name", "Perm"),
            _v("CMINDC", "Indication", "Perm"),
            _v("CMDOSE", "Dose per Administration", "Perm", "Num"),
            _v("CMDOSU", "Dose Units", "Perm", codelist="C71620"),
            _v("CMROUTE", "Route of Administration", "Perm", codelist="C66729"),
            _v("CMSTDTC", "Start Date/Time of Medication", "Exp"),
            _v("CMENDTC", "End Date/Time of Medication", "Exp"),
            _v("CMSTDY", "Study Day of Start of Medication", "Perm", "Num"),
            _v("CMENDY", "Study Day of End of Medication", "Perm", "Num"),
        ],
    },
    "EX": {
        "label": "Exposure",
        "class": "Interventions",
        "structure": "One record per protocol-specified study treatment, constant-dosing interval, per subject",
        "variables": _identifiers("EX")
        + [
            _v("EXTRT", "Name of Study Treatment", "Req", role="Topic"),
            _v("EXDOSE", "Dose", "Exp", "Num"),
            _v("EXDOSU", "Dose Units", "Exp", codelist="C71620"),
            _v("EXROUTE", "Route of Administration", "Perm", codelist="C66729"),
            _v("EXSTDTC", "Start Date/Time of Treatment", "Exp"),
            _v("EXENDTC", "End Date/Time of Treatment", "Exp"),
            _v("EXSTDY", "Study Day of Start of Treatment", "Perm", "Num"),
            _v("EXENDY", "Study Day of End of Treatment", "Perm", "Num"),
        ],
    },
    "MH": {
        "label": "Medical History",
        "class": "Events",
        "structure": "One record per medical history event per subject",
        "variables": _identifiers("MH")
        + [
            _v("MHTERM", "Reported Term for the Medical History", "Req", role="Topic"),
            _v("MHDECOD", "Dictionary-Derived Term", "Perm"),
            _v("MHCAT", "Category for Medical History", "Perm"),
            _v("MHSTDTC", "Start Date/Time of History Event", "Perm"),
            _v("MHENDTC", "End Date/Time of History Event", "Perm"),
            _v("MHDY", "Study Day of History Collection", "Perm", "Num"),
        ],
    },
    "DS": {
        "label": "Disposition",
        "class": "Events",
        "structure": "One record per disposition status or protocol milestone per subject",
        "variables": _identifiers("DS")
        + [
            _v("DSTERM", "Reported Term for the Disposition Event", "Req", role="Topic"),
            _v("DSDECOD", "Standardized Disposition Term", "Req", codelist="C66727"),
            _v("DSCAT", "Category for Disposition Event", "Exp", codelist="C74558"),
            _v("DSSTDTC", "Start Date/Time of Disposition Event", "Exp"),
            _v("DSSTDY", "Study Day of Start of Disposition Event", "Perm", "Num"),
        ],
    },
    "IE": {
        "label": "Inclusion/Exclusion Criteria Not Met",
        "class": "Findings",
        "structure": "One record per inclusion/exclusion criterion not met per subject",
        "variables": _identifiers("IE")
        + [
            _v("IETESTCD", "Incl/Excl Criterion Short Name", "Req", role="Topic"),
            _v("IETEST", "Inclusion/Exclusion Criterion", "Req"),
            _v("IECAT", "Inclusion/Exclusion Category", "Req", codelist="C66797"),
            _v("IEORRES", "I/E Criterion Original Result", "Req"),
            _v("IESTRESC", "I/E Criterion Result in Std Format", "Req"),
            _v("IEDTC", "Date/Time of Collection", "Perm"),
        ],
    },
    "SUPPQUAL": {
        "label": "Supplemental Qualifiers",
        "class": "Relationship",
        "structure": "One record per supplemental qualifier per related record",
        "variables": [
            _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
            _v("RDOMAIN", "Related Domain Abbreviation", "Req", role="Identifier"),
            _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
            _v("IDVAR", "Identifying Variable", "Exp", role="Identifier"),
            _v("IDVARVAL", "Identifying Variable Value", "Exp", role="Identifier"),
            _v("QNAM", "Qualifier Variable Name", "Req", role="Topic", length=8),
            _v("QLABEL", "Qualifier Variable Label", "Req", length=40),
            _v("QVAL", "Data Value", "Req"),
            _v("QORIG", "Origin", "Req"),
            _v("QEVAL", "Evaluator", "Perm"),
        ],
    },
    "RELSUB": {
        "label": "Related Subjects",
        "class": "Relationship",
        "structure": "One record per relationship per related subject",
        "variables": [
            _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
            _v("DOMAIN", "Domain Abbreviation", "Req", role="Identifier"),
            _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
            _v("RSUBJID", "Related Subject Identifier", "Req", role="Identifier"),
            _v("SREL", "Subject Relationship", "Req", role="Topic"),
        ],
    },
    "RELREC": {
        "label": "Related Records",
        "class": "Relationship",
        "structure": "One record per related record or group of records",
        "variables": [
            _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
            _v("RDOMAIN", "Related Domain Abbreviation", "Req", role="Identifier"),
            _v("USUBJID", "Unique Subject Identifier", "Exp", role="Identifier"),
            _v("IDVAR", "Identifying Variable", "Req", role="Identifier"),
            _v("IDVARVAL", "Identifying Variable Value", "Exp", role="Identifier"),
            _v("RELTYPE", "Relationship Type", "Perm"),
            _v("RELID", "Relationship Identifier", "Req"),
        ],
    },
}

# attach orders (IG variable order = list position)
for _dom in DOMAINS.values():
    for _i, _var in enumerate(_dom["variables"]):
        _var["order"] = _i + 1


def get_domain(code: str) -> dict:
    return DOMAINS[code.upper()]


def supp_domain_for(rdomain: str) -> dict:
    """SUPP-- definition derived from the SUPPQUAL template
    (reference: sdtm/domain.rs:220-228)."""
    base = DOMAINS["SUPPQUAL"]
    return {
        "label": f"Supplemental Qualifiers for {rdomain.upper()}",
        "class": base["class"],
        "structure": base["structure"],
        "variables": [dict(v) for v in base["variables"]],
    }


REGISTRY_CSV_COLUMNS = (
    "domain,name,label,core,data_type,role,codelist_code,length,order"
)


def dump_registry_csv() -> str:
    """Serialize the registry in the Variables.csv shape a production
    deployment would ship (and `load_registry_csv` reads back)."""
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(REGISTRY_CSV_COLUMNS.split(","))
    for code, d in DOMAINS.items():
        for v in d["variables"]:
            w.writerow(
                [code, v["name"], v["label"], v["core"], v["data_type"],
                 v["role"], v["codelist_code"], v["length"] or "", v["order"]]
            )
    return buf.getvalue()


def load_registry_csv(text: str) -> dict[str, list[dict]]:
    out: dict[str, list[dict]] = {}
    for row in csv.DictReader(io.StringIO(text)):
        out.setdefault(row["domain"], []).append(
            {
                "name": row["name"],
                "label": row["label"],
                "core": row["core"],
                "data_type": row["data_type"],
                "role": row["role"],
                "codelist_code": row["codelist_code"],
                "length": int(row["length"]) if row["length"] else None,
                "order": int(row["order"]),
            }
        )
    return out
