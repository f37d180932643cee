"""pdf_parser_ray — a Ray-Data-native document-extraction engine.

Rebuilds the extraction semantics of the reference repo Rsiran/PDF-parser
(``sec_parser``, a single-process PDF→markdown batch tool) as streaming
``ray.data.Dataset`` pipelines over Parquet shards of Common-Crawl-style web
pages (``url, warc_ts, html, text, lang``).

Layout
------
``kernels/``    pure-Python per-document logic (no Ray imports): tokenizer,
                section segmentation, table normalization, taxonomy matching,
                metadata, validation. The unit of correctness is
                ``kernels.docpipe.process_document`` — row in, record out.
``stages/``     Ray Data stages: the extraction actor pool, dedup family,
                text statistics, similarity search, consistency shuffle,
                manifest/resume writer, multimodal stubs.
``sources/``    corpus synthesis + readers.
``pipelines/``  end-to-end pipeline compositions.

Nothing in this package calls ``ray.init()``; sessions are owned by the
caller (bench.py, tests/conftest.py, or the driver).
"""

__version__ = "0.1.0"
