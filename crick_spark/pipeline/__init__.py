from crick_spark.pipeline.dedup import (  # noqa: F401
    exact_dedup,
    jaccard_verify_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    minhash_signatures,
    near_dup_pairs,
    shingles_expr,
    simhash_expr,
    simhash_near_dup_pairs,
    simhash_signatures,
)
from crick_spark.pipeline.sampling import (  # noqa: F401
    domain_mix_rates,
    domain_mix_resample,
    domain_mix_summary,
    md5_uniform,
)
from crick_spark.pipeline.similarity import cosine_topk, lsh_ann_topk  # noqa: F401
from crick_spark.pipeline.text import (  # noqa: F401
    doc_fingerprint_expr,
    lang_id_expr,
    quality_exprs,
    token_count_exprs,
)
from crick_spark.pipeline.multimodal import (  # noqa: F401
    MEDIA_META_SCHEMA,
    attach_fake_media,
    decode_media_batch,
    extract_image_features,
)
