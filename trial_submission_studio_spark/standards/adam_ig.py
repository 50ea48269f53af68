"""ADaM-IG v1.3 structure registry — the reference's second standards
surface (tss-standards/src/adam_ig.rs + data/adam/ig/v1.3).

ADaM defines *structures*, not domains: ADSL (one row per subject),
BDS (one row per subject/parameter/analysis visit) and OCCDS
(occurrence analysis, ADAE-shaped). Hand-written from public ADaM-IG
v1.3 knowledge in the same dict shape as
:mod:`~trial_submission_studio_spark.standards.sdtm_domains`, so the
plan compiler, validator and Define-XML writer consume ADaM datasets
unchanged (``registry=`` parameter of ``create_study``).

ADaM temporal variables are numeric SAS dates (*DT/*DTM/*TM) with
imputation-flag partners (*DTF/*TMF) — unlike SDTM's ISO strings.
Note the name-pattern inference tier (``infer_rules``) still treats a
``*DT`` suffix as an ISO date (the ladder preserves numerics-as-text
unchanged); pipelines deriving true numeric SAS dates supply explicit
``numeric`` rules for them, as sponsors do in practice.
"""

from __future__ import annotations

import re

from trial_submission_studio_spark.standards.sdtm_domains import _v


def _ident_block() -> list[dict]:
    return [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
        _v("SUBJID", "Subject Identifier for the Study", "Req", role="Identifier"),
        _v("SITEID", "Study Site Identifier", "Req", role="Identifier"),
    ]


def _adsl_vars() -> list[dict]:
    return _ident_block() + [
        _v("AGE", "Age", "Req", "Num"),
        _v("AGEU", "Age Units", "Req", codelist="C66781"),
        _v("AGEGR1", "Pooled Age Group 1", "Perm"),
        _v("SEX", "Sex", "Req", codelist="C66731"),
        _v("RACE", "Race", "Req", codelist="C74457"),
        _v("ETHNIC", "Ethnicity", "Perm", codelist="C66790"),
        _v("COUNTRY", "Country", "Perm"),
        _v("ARM", "Description of Planned Arm", "Req"),
        _v("ACTARM", "Description of Actual Arm", "Perm"),
        _v("TRT01P", "Planned Treatment for Period 01", "Req"),
        _v("TRT01A", "Actual Treatment for Period 01", "Exp"),
        _v("TRTSDT", "Date of First Exposure to Treatment", "Exp", "Num"),
        _v("TRTSDTM", "Datetime of First Exposure to Treatment", "Perm", "Num"),
        _v("TRTEDT", "Date of Last Exposure to Treatment", "Exp", "Num"),
        _v("TRTEDTM", "Datetime of Last Exposure to Treatment", "Perm", "Num"),
        _v("TRTDURD", "Total Treatment Duration (Days)", "Perm", "Num"),
        _v("RANDDT", "Date of Randomization", "Perm", "Num"),
        _v("RANDFL", "Randomized Population Flag", "Perm", codelist="C66742"),
        _v("SAFFL", "Safety Population Flag", "Exp", codelist="C66742"),
        _v("ITTFL", "Intent-To-Treat Population Flag", "Perm", codelist="C66742"),
        _v("FASFL", "Full Analysis Set Population Flag", "Perm", codelist="C66742"),
        _v("PPROTFL", "Per-Protocol Population Flag", "Perm", codelist="C66742"),
        _v("COMPLFL", "Completers Population Flag", "Perm", codelist="C66742"),
        _v("EOSSTT", "End of Study Status", "Exp"),
        _v("EOSDT", "End of Study Date", "Perm", "Num"),
        _v("DCSREAS", "Reason for Discontinuation from Study", "Exp",
           codelist="C66727"),
        _v("DTHDT", "Date of Death", "Exp", "Num"),
        _v("DTHFL", "Subject Death Flag", "Exp", codelist="C66742"),
        _v("DTHCAUS", "Cause of Death", "Perm"),
        _v("LSTALVDT", "Date Last Known Alive", "Perm", "Num"),
        _v("RFICDT", "Date of Informed Consent", "Perm", "Num"),
    ]


def _bds_vars() -> list[dict]:
    return _ident_block()[:2] + [
        _v("PARAM", "Parameter", "Req", role="Topic"),
        _v("PARAMCD", "Parameter Code", "Req", role="Topic", length=8),
        _v("PARAMN", "Parameter (N)", "Perm", "Num"),
        _v("PARCAT1", "Parameter Category 1", "Perm",
           role="Grouping Qualifier"),
        _v("AVAL", "Analysis Value", "Exp", "Num", role="Result Qualifier"),
        _v("AVALC", "Analysis Value (C)", "Perm", role="Result Qualifier"),
        _v("BASE", "Baseline Value", "Exp", "Num"),
        _v("BASEC", "Baseline Value (C)", "Perm"),
        _v("BASETYPE", "Baseline Type", "Perm"),
        _v("ABLFL", "Baseline Record Flag", "Exp", codelist="C66742"),
        _v("CHG", "Change from Baseline", "Perm", "Num"),
        _v("PCHG", "Percent Change from Baseline", "Perm", "Num"),
        _v("ANRLO", "Analysis Normal Range Lower Limit", "Perm", "Num"),
        _v("ANRHI", "Analysis Normal Range Upper Limit", "Perm", "Num"),
        _v("ANRIND", "Analysis Reference Range Indicator", "Perm",
           codelist="C78736"),
        _v("BNRIND", "Baseline Reference Range Indicator", "Perm",
           codelist="C78736"),
        _v("SHIFT1", "Shift 1", "Perm"),
        _v("DTYPE", "Derivation Type", "Perm"),
        _v("AVISIT", "Analysis Visit", "Exp", role="Timing"),
        _v("AVISITN", "Analysis Visit (N)", "Perm", "Num", role="Timing"),
        _v("ATPT", "Analysis Timepoint", "Perm", role="Timing"),
        _v("ATPTN", "Analysis Timepoint (N)", "Perm", "Num", role="Timing"),
        _v("ADT", "Analysis Date", "Exp", "Num", role="Timing"),
        _v("ADTM", "Analysis Datetime", "Perm", "Num", role="Timing"),
        _v("ADY", "Analysis Relative Day", "Perm", "Num", role="Timing"),
        _v("ADTF", "Analysis Date Imputation Flag", "Perm"),
        _v("ASEQ", "Analysis Sequence Number", "Perm", "Num",
           role="Identifier"),
        _v("TRTP", "Planned Treatment", "Req"),
        _v("TRTA", "Actual Treatment", "Perm"),
        _v("APERIOD", "Period", "Perm", "Num", role="Timing"),
        _v("CRIT1", "Analysis Criterion 1", "Perm"),
        _v("CRIT1FL", "Criterion 1 Evaluation Result Flag", "Perm",
           codelist="C66742"),
        _v("ANL01FL", "Analysis Flag 01", "Perm", codelist="C66742"),
    ]


def _occds_vars() -> list[dict]:
    return _ident_block()[:2] + [
        _v("AEDECOD", "Dictionary-Derived Term", "Req", role="Topic"),
        _v("AEBODSYS", "Body System or Organ Class", "Exp"),
        _v("AESEV", "Severity/Intensity", "Perm", codelist="C66769"),
        _v("AESER", "Serious Event", "Exp", codelist="C66742"),
        _v("AREL", "Analysis Causality", "Perm"),
        _v("AESEQ", "Sequence Number", "Exp", "Num", role="Identifier"),
        _v("TRTP", "Planned Treatment", "Req"),
        _v("TRTA", "Actual Treatment", "Exp"),
        _v("TRTEMFL", "Treatment Emergent Analysis Flag", "Exp",
           codelist="C66742"),
        _v("ASTDT", "Analysis Start Date", "Exp", "Num", role="Timing"),
        _v("ASTDY", "Analysis Start Relative Day", "Perm", "Num",
           role="Timing"),
        _v("AENDT", "Analysis End Date", "Perm", "Num", role="Timing"),
        _v("AENDY", "Analysis End Relative Day", "Perm", "Num", role="Timing"),
        _v("ADURN", "Analysis Duration (N)", "Perm", "Num"),
        _v("ADURU", "Analysis Duration Units", "Perm", codelist="C71620"),
        _v("APERIOD", "Period", "Perm", "Num", role="Timing"),
        _v("ANL01FL", "Analysis Flag 01", "Perm", codelist="C66742"),
    ]


def _w(pattern: str, label: str, core: str = "Perm", dtype: str = "Char",
       codelist: str | None = None) -> dict:
    return {
        "pattern": pattern,
        "label": label,
        "core": core,
        "data_type": dtype,
        "codelist_code": codelist,
    }


#: ADaM-IG v1.3 WILDCARD variable patterns (~122 of the IG's ~300
#: variable rows carry xx/y/w/zz placeholders — reference
#: data/adam/ig/v1.3/Variables.csv). Lowercase tokens are numeric
#: placeholders per the IG's naming-fragment convention: ``xx``/``zz``
#: = two digits (period / flag number), ``y``/``w`` = 1-2 digit
#: integer (group / criterion / phase index). The inventory below is
#: the public ADaM-IG v1.3 list.
ADAM_WILDCARD_PATTERNS: dict[str, list[dict]] = {
    "ADSL": [
        _w("SITEGRy", "Pooled Site Group y"),
        _w("SITEGRyN", "Pooled Site Group y (N)", dtype="Num"),
        _w("REGIONy", "Geographic Region y"),
        _w("REGIONyN", "Geographic Region y (N)", dtype="Num"),
        _w("AGEGRy", "Pooled Age Group y"),
        _w("AGEGRyN", "Pooled Age Group y (N)", dtype="Num"),
        _w("RACEGRy", "Pooled Race Group y"),
        _w("RACEGRyN", "Pooled Race Group y (N)", dtype="Num"),
        _w("TRTxxP", "Planned Treatment for Period xx", core="Req"),
        _w("TRTxxPN", "Planned Treatment for Period xx (N)", dtype="Num"),
        _w("TRTxxA", "Actual Treatment for Period xx", core="Cond"),
        _w("TRTxxAN", "Actual Treatment for Period xx (N)", dtype="Num"),
        _w("TRxxPGy", "Planned Pooled Treatment y for Period xx"),
        _w("TRxxPGyN", "Planned Pooled Trt y for Period xx (N)", dtype="Num"),
        _w("TRxxAGy", "Actual Pooled Treatment y for Period xx", core="Cond"),
        _w("TRxxAGyN", "Actual Pooled Trt y for Period xx (N)", dtype="Num"),
        _w("TSEQPGy", "Planned Pooled Treatment Sequence y"),
        _w("TSEQPGyN", "Planned Pooled Treatment Sequence y (N)", dtype="Num"),
        _w("TSEQAGy", "Actual Pooled Treatment Sequence y", core="Cond"),
        _w("TSEQAGyN", "Actual Pooled Treatment Sequence y (N)", dtype="Num"),
        _w("DOSExxP", "Planned Treatment Dose for Period xx", dtype="Num"),
        _w("DOSExxA", "Actual Treatment Dose for Period xx", dtype="Num"),
        _w("DOSExxU", "Units for Dose for Period xx"),
        _w("TRxxSDT", "Date of First Exposure in Period xx", core="Cond", dtype="Num"),
        _w("TRxxSTM", "Time of First Exposure in Period xx", core="Cond", dtype="Num"),
        _w("TRxxSDTM", "Datetime of First Exposure in Period xx", core="Cond", dtype="Num"),
        _w("TRxxSDTF", "Date 1st Exposure Period xx Imput. Flag", core="Cond", codelist="C81223"),
        _w("TRxxSTMF", "Time 1st Exposure Period xx Imput. Flag", core="Cond", codelist="C81226"),
        _w("TRxxEDT", "Date of Last Exposure in Period xx", core="Cond", dtype="Num"),
        _w("TRxxETM", "Time of Last Exposure in Period xx", core="Cond", dtype="Num"),
        _w("TRxxEDTM", "Datetime of Last Exposure in Period xx", core="Cond", dtype="Num"),
        _w("TRxxEDTF", "Date Last Exposure Period xx Imput. Flag", core="Cond", codelist="C81223"),
        _w("TRxxETMF", "Time Last Exposure Period xx Imput. Flag", core="Cond", codelist="C81226"),
        _w("APxxSDT", "Period xx Start Date", dtype="Num"),
        _w("APxxSTM", "Period xx Start Time", dtype="Num"),
        _w("APxxSDTM", "Period xx Start Datetime", dtype="Num"),
        _w("APxxSDTF", "Period xx Start Date Imput. Flag", core="Cond", codelist="C81223"),
        _w("APxxSTMF", "Period xx Start Time Imput. Flag", core="Cond", codelist="C81226"),
        _w("APxxEDT", "Period xx End Date", dtype="Num"),
        _w("APxxETM", "Period xx End Time", dtype="Num"),
        _w("APxxEDTM", "Period xx End Datetime", dtype="Num"),
        _w("APxxEDTF", "Period xx End Date Imput. Flag", core="Cond", codelist="C81223"),
        _w("APxxETMF", "Period xx End Time Imput. Flag", core="Cond", codelist="C81226"),
        _w("PxxSw", "Description of Period xx Subperiod w"),
        _w("PxxSwSDT", "Period xx Subperiod w Start Date", dtype="Num"),
        _w("PxxSwSTM", "Period xx Subperiod w Start Time", dtype="Num"),
        _w("PxxSwSDM", "Period xx Subperiod w Start Datetime", dtype="Num"),
        _w("PxxSwSDF", "Period xx Subper w Start Date Imput Flag", core="Cond", codelist="C81223"),
        _w("PxxSwSTF", "Period xx Subper w Start Time Imput Flag", core="Cond", codelist="C81226"),
        _w("PxxSwEDT", "Period xx Subperiod w End Date", dtype="Num"),
        _w("PxxSwETM", "Period xx Subperiod w End Time", dtype="Num"),
        _w("PxxSwEDM", "Period xx Subperiod w End Datetime", dtype="Num"),
        _w("PxxSwEDF", "Period xx Subper w End Date Imput Flag", core="Cond", codelist="C81223"),
        _w("PxxSwETF", "Period xx Subper w End Time Imput Flag", core="Cond", codelist="C81226"),
        _w("APHASEw", "Description of Phase w"),
        _w("PHwSDT", "Phase w Start Date", dtype="Num"),
        _w("PHwSTM", "Phase w Start Time", dtype="Num"),
        _w("PHwSDTM", "Phase w Start Datetime", dtype="Num"),
        _w("PHwSDTF", "Phase w Start Date Imputation Flag", core="Cond", codelist="C81223"),
        _w("PHwSTMF", "Phase w Start Time Imputation Flag", core="Cond", codelist="C81226"),
        _w("PHwEDT", "Phase w End Date", dtype="Num"),
        _w("PHwETM", "Phase w End Time", dtype="Num"),
        _w("PHwEDTM", "Phase w End Datetime", dtype="Num"),
        _w("PHwEDTF", "Phase w End Date Imputation Flag", core="Cond", codelist="C81223"),
        _w("PHwETMF", "Phase w End Time Imputation Flag", core="Cond", codelist="C81226"),
        _w("EOTxxSTT", "End of Treatment Status in Period xx", codelist="C124296"),
        _w("DCTxxRS", "Reason for Discont of Treat in Period xx"),
        _w("DCTxxRSP", "Reason Spec for Disc of Trt in Period xx"),
        _w("EOPxxSTT", "End of Period xx Status", codelist="C124296"),
        _w("DCPxxRS", "Reason for Discont from Period xx"),
        _w("DCPxxRSP", "Reason Spec for Discont from Period xx"),
        _w("RFICyDT", "Date of Informed Consent y", dtype="Num"),
        _w("ENRLyDT", "Date of Enrollment y", dtype="Num"),
        _w("RANDyDT", "Date of Randomization y", dtype="Num"),
        _w("TRCMPGy", "Treatment Compliance (%) Group y"),
        _w("TRCMPGyN", "Treatment Compliance (%) Group y (N)", dtype="Num"),
        _w("TRxxDURD", "Treatment Duration in Period xx (Days)", dtype="Num"),
        _w("TRxxDURM", "Treatment Duration in Period xx (Months)", dtype="Num"),
        _w("TRxxDURY", "Treatment Duration in Period xx (Years)", dtype="Num"),
        _w("DTHCGRy", "Cause of Death Group y"),
        _w("DTHCGRyN", "Cause of Death Group y (N)", dtype="Num"),
        _w("STRATwD", "Description of Stratification Factor w"),
        _w("STRATwR", "Strat Factor w Value Used for Rand"),
        _w("STRATwRN", "Strat Factor w Value Used for Rand (N)", dtype="Num"),
        _w("STRATwV", "Strat Factor w Value from Verif Source"),
        _w("STRATwVN", "Strat Fact w Val from Verif Source (N)", dtype="Num"),
    ],
    "BDS": [
        _w("TRTPGy", "Planned Pooled Treatment y"),
        _w("TRTPGyN", "Planned Pooled Treatment y (N)", dtype="Num"),
        _w("TRTAGy", "Actual Pooled Treatment y", core="Cond"),
        _w("TRTAGyN", "Actual Pooled Treatment y (N)", dtype="Num"),
        _w("PARCATy", "Parameter Category y"),
        _w("PARCATyN", "Parameter Category y (N)", dtype="Num"),
        _w("AVALCATy", "Analysis Value Category y"),
        _w("AVALCAyN", "Analysis Value Category y (N)", dtype="Num"),
        _w("BASECATy", "Baseline Category y"),
        _w("BASECAyN", "Baseline Category y (N)", dtype="Num"),
        _w("CHGCATy", "Change from Baseline Category y"),
        _w("CHGCATyN", "Change from Baseline Category y (N)", dtype="Num"),
        _w("PCHGCATy", "Percent Chg from Baseline Category y"),
        _w("PCHGCAyN", "Percent Chg from Baseline Category y (N)", dtype="Num"),
        _w("R2AyLO", "Ratio to Analysis Range y Lower Limit", dtype="Num"),
        _w("R2AyHI", "Ratio to Analysis Range y Upper Limit", dtype="Num"),
        _w("SHIFTy", "Shift y"),
        _w("SHIFTyN", "Shift y (N)", dtype="Num"),
        _w("BCHGCATy", "Change to Baseline Category y"),
        _w("BCHGCAyN", "Change to Baseline Category y (N)", dtype="Num"),
        _w("PBCHGCAy", "Percent Change to Baseline Category y"),
        _w("PBCHGCyN", "Percent Change to Baseline Category y (N)", dtype="Num"),
        _w("CRITy", "Analysis Criterion y"),
        _w("CRITyFL", "Criterion y Evaluation Result Flag", core="Cond"),
        _w("CRITyFN", "Criterion y Evaluation Result Flag (N)", dtype="Num"),
        _w("MCRITy", "Analysis Multi-Response Criterion y"),
        _w("MCRITyML", "Multi-Response Criterion y Evaluation", core="Cond"),
        _w("MCRITyMN", "Multi-Response Criterion y Eval (N)", dtype="Num"),
        _w("AyLO", "Analysis Range y Lower Limit", core="Cond", dtype="Num"),
        _w("AyLOC", "Analysis Range y Lower Limit (C)"),
        _w("AyHI", "Analysis Range y Upper Limit", core="Cond", dtype="Num"),
        _w("AyHIC", "Analysis Range y Upper Limit (C)"),
        _w("AyIND", "Analysis Range y Indicator"),
        _w("ByIND", "Baseline Analysis Range y Indicator"),
        _w("ANLzzFL", "Analysis Flag zz", core="Cond"),
        _w("ANLzzFN", "Analysis Flag zz (N)", dtype="Num"),
    ],
}
ADAM_WILDCARD_PATTERNS["OCCDS"] = [
    p for p in ADAM_WILDCARD_PATTERNS["BDS"]
    if p["pattern"].startswith(("TRT", "ANL"))
]

_PLACEHOLDER_WIDTH = {"xx": r"(\d{2})", "zz": r"(\d{2})", "y": r"(\d{1,2})", "w": r"(\d{1,2})"}


def _pattern_regex(pattern: str) -> "re.Pattern[str]":
    out = []
    for piece in re.split(r"(xx|zz|y|w)", pattern):
        out.append(_PLACEHOLDER_WIDTH.get(piece) or re.escape(piece))
    return re.compile("^" + "".join(out) + "$")


def match_adam_wildcard(name: str, structure: str = "BDS") -> dict | None:
    """Resolve a concrete sponsor variable name (``AVALCAT1``,
    ``TRT02P``, ``ANL03FL``) against the IG wildcard patterns of its
    structure. Returns a concrete variable dict with placeholder
    values substituted into the label, or None.
    """
    up = name.strip().upper()
    for p in ADAM_WILDCARD_PATTERNS.get(structure.upper(), []):
        m = _pattern_regex(p["pattern"]).match(up)
        if not m:
            continue
        label = p["label"]
        tokens = re.findall(r"xx|zz|y|w", p["pattern"])
        for token, value in zip(tokens, m.groups()):
            label = re.sub(rf"\b{token}\b", value, label, count=1)
        return _v(
            up,
            label,
            p["core"],
            "Num" if p["data_type"] == "Num" else "Char",
            codelist=p["codelist_code"],
        )
    return None


ADAM_STRUCTURES: dict[str, dict] = {
    "ADSL": {
        "label": "Subject-Level Analysis Dataset",
        "class": "Subject Level Analysis Dataset",
        "structure": "One record per subject",
        "variables": _adsl_vars(),
    },
    "BDS": {
        "label": "Basic Data Structure",
        "class": "Basic Data Structure",
        "structure": "One record per subject per parameter per analysis "
                     "visit per analysis timepoint",
        "variables": _bds_vars(),
    },
    "OCCDS": {
        "label": "Occurrence Data Structure",
        "class": "Occurrence Data Structure",
        "structure": "One record per subject per occurrence",
        "variables": _occds_vars(),
    },
}

for _d in ADAM_STRUCTURES.values():
    for _i, _var in enumerate(_d["variables"]):
        _var["order"] = _i + 1


def adam_dataset(
    name: str, structure: str = "BDS", columns: list[str] | None = None
) -> dict:
    """A concrete ADaM dataset (e.g. ADLB) from its structure template
    (reference builds ADaM datasets the same way: structure + sponsor
    parameters).

    ``columns``: the sponsor's concrete column names. Any name that
    is absent from the base template but matches an IG wildcard
    pattern (``AVALCAT2``, ``CRIT3FL``, ``TRT02P`` — see
    :data:`ADAM_WILDCARD_PATTERNS`) is materialized into the variable
    list, so parameter-level rules infer exactly like template
    variables.
    """
    base = ADAM_STRUCTURES[structure.upper()]
    variables = [dict(v) for v in base["variables"]]
    if columns:
        have = {v["name"] for v in variables}
        for c in columns:
            up = c.strip().upper()
            if up in have:
                continue
            hit = match_adam_wildcard(up, structure)
            if hit is not None:
                hit["order"] = len(variables) + 1
                variables.append(hit)
                have.add(up)
    return {
        "label": name.upper(),
        "class": base["class"],
        "structure": base["structure"],
        "variables": variables,
    }
