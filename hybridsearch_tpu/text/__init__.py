from hybridsearch_tpu.text.extractor import (  # noqa: F401
    STOPWORDS,
    extract_tokens,
    preprocess_text,
    extract_metadata,
    load_file_content,
    discover_documents,
)
from hybridsearch_tpu.text.chunker import (  # noqa: F401
    Chunk,
    SentenceChunker,
    ParagraphChunker,
    SlidingWindowChunker,
    SemanticChunker,
    get_chunker,
)
