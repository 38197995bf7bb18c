from sgc_tpu.data.planetoid import CitationData, load_citation
from sgc_tpu.data.reddit import RedditData, load_reddit

__all__ = ["CitationData", "load_citation", "RedditData", "load_reddit"]
