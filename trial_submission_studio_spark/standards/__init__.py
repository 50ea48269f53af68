from trial_submission_studio_spark.standards.ct import (  # noqa: F401
    Codelist,
    Term,
    codelist_lookup_df,
    load_ct_csv,
)
