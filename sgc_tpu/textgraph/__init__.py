"""Text -> doc-word graph construction (the TextSGC offline pipeline).

Re-implements the reference's L8 layer (SURVEY.md §1): corpus cleaning
(tokenizer / stopword / lemmatizer registries — reference
downstream/TextSGC_indexing/remove_words.py), and the heterogeneous
doc-word graph builders (TF-IDF doc->word "B", transpose "C", PMI
word<->word "D" over sliding context windows — reference
downstream/TextSGC/build_graph.py) with pivoted TF-IDF, chi-squared
feature selection and embedding-cosine edge weighting from the
TextSGC_indexing / TextSGC_Bio variants.

Construction is vectorized numpy over integer-encoded token streams
instead of the reference's python Counter loops.
"""

from sgc_tpu.textgraph.clean import clean_corpus  # noqa: F401
from sgc_tpu.textgraph.graph import TextGraphBuilder, build_text_graph  # noqa: F401
from sgc_tpu.textgraph.embedding import (  # noqa: F401
    WordEmbedder,
    EmbedderConfig,
    load_embedding_map,
    save_embedding_map,
)
from sgc_tpu.textgraph.word2vec import Word2Vec, Word2VecConfig  # noqa: F401
