"""[EXT] LLM-data-pipeline operators (north star, BASELINE.json; SURVEY §2.9 [EXT]).

No reference citation by definition — these extend the engine with the operations a
large-scale training-data pipeline needs, designed for 100 TB:

- ``dedup``      — exact (hash), MinHash+LSH, SimHash, n-gram Jaccard near-dup
- ``similarity`` — embedding cosine top-k: brute-force baseline + IVF scale path
- ``text``       — language-ID, quality scoring, token counting, fingerprinting
- ``multimodal`` — binary media columns with typed metadata; real pure-numpy
                   WAV (RIFF PCM) / PPM (P6) decode + features, Arrow-batched
- ``sketch``     — Misra-Gries heavy hitters, HLL++ distinct profile
- ``quantize``   — symmetric int8 embedding quantization
- ``sampling``   — md5 hash splits, stratified samples, sqrt-temperature mixtures
- ``lm``         — corpus unigram-LM surprisal scoring (CCNet-style quality)
- ``projection`` — Achlioptas random projection (exact + numpy fast paths)
- ``ingest``     — audited three-stage corpus admission (+ indexed amortized path)
- ``bpe``        — real BPE vocabulary training + merge-list encoding
"""

from .dedup import (  # noqa: F401
    contaminated_ids,
    contamination_ratio,
    exact_dedup,
    duplicate_groups,
    token_shingles,
    minhash_signature,
    minhash_signatures,
    lsh_band_hashes,
    minhash_candidate_pairs,
    minhash_near_dup_pairs,
    jaccard_verify,
    simhash64,
    hamming_distance,
)
from .similarity import cosine, cosine_topk_bruteforce, cosine_topk_ivf, dot, l2_norm  # noqa: F401
from .packing import pack_sequences  # noqa: F401
from .text import (  # noqa: F401
    chunk_documents,
    doc_fingerprint,
    language_scores,
    language_id,
    quality_features,
    quality_score,
    token_count,
    tokens,
)
from .multimodal import (  # noqa: F401
    decode_media,
    extract_features,
    make_ppm_bytes,
    make_wav_bytes,
    media_features,
    media_summary,
    parse_ppm,
    parse_wav,
    synthesize_media,
)
from .quantize import reconstruction_error, with_int8_quantization  # noqa: F401
from .sketch import distinct_sketch_profile, heavy_hitters  # noqa: F401
from .sampling import hash_split, stratified_sample, temperature_sample  # noqa: F401
from .lm import score_surprisal, unigram_vocab  # noqa: F401
from .projection import random_project, random_project_fast  # noqa: F401
from .ingest import build_corpus_index, incremental_ingest, incremental_ingest_indexed  # noqa: F401
from .bpe import encode_with_merges, train_bpe_merges  # noqa: F401
