from sgc_tpu.data.planetoid import CitationData, load_citation
from sgc_tpu.data.reddit import RedditData, load_reddit

__all__ = ["CitationData", "load_citation", "RedditData", "load_reddit"]

from sgc_tpu.data.covid import CovidPrepConfig, prepare_covid_dataset  # noqa: F401
from sgc_tpu.data.crossval import make_crossval_ids  # noqa: F401
from sgc_tpu.data.textcorpus import TextCorpusData, load_corpus  # noqa: F401

__all__ += [
    "CovidPrepConfig",
    "prepare_covid_dataset",
    "make_crossval_ids",
    "TextCorpusData",
    "load_corpus",
]
