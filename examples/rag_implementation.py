"""RAG pipeline — embed → search → assemble context → generate.

Functional parity with the reference RAG example (reference
examples/rag_implementation.py:11-92): pick an embedding plugin by the
fallback chain, embed the query, search with a similarity threshold,
assemble context from result metadata, and feed an LLM plugin. Runs
offline via the plugins' demo modes (set WDBX_OLLAMA_DEMO=true).
"""

import asyncio
import os

from wdbx_tpu import WDBX
from wdbx_tpu.utils.data_utils import chunk_text

os.environ.setdefault("WDBX_OLLAMA_DEMO", "true")

DOCUMENTS = {
    "tpu-intro": (
        "TPUs are matrix accelerators built around a systolic array. "
        "The MXU performs 128x128 matmuls; HBM feeds it through VMEM."
    ),
    "vector-db": (
        "A vector database stores embeddings and retrieves nearest "
        "neighbors by cosine similarity for retrieval-augmented generation."
    ),
    "sharding": (
        "Sharding a corpus across devices lets each chip scan its slice "
        "in parallel; results merge with an all-gather top-k."
    ),
}


async def rag_pipeline(db: WDBX, question: str) -> str:
    # 1. Resolve an embedding plugin (ollama → lmstudio fallback chain).
    embedder = None
    for name in ("ollama", "lmstudio", "openai"):
        embedder = db.get_plugin(name)
        if embedder is not None:
            break
    if embedder is None:
        raise RuntimeError("no embedding plugin available")

    # 2. Embed the question and retrieve context (threshold like the
    #    reference's 0.6 — demo embeddings are random, so use 0.0 here).
    query_embedding = await embedder.create_embedding(question)
    hits = await db.vector_search_async(query_embedding, limit=3, threshold=0.0)

    # 3. Assemble context from result metadata.
    context = "\n\n".join(
        f"[{vid}] {meta.get('content', '')}" for vid, _score, meta in hits
    )

    # 4. Generate with the LLM plugin (chat if available).
    llm = db.get_plugin("ollama") or db.get_plugin("lmstudio")
    prompt = (
        f"Answer using only this context:\n{context}\n\nQuestion: {question}"
    )
    if hasattr(llm, "chat"):
        return await llm.chat([{"role": "user", "content": prompt}])
    return await llm.generate_text(prompt)


async def main() -> None:
    db = WDBX(vector_dimension=384, data_dir="./wdbx_data_rag")
    await db.initialize()

    # Ingest: chunk each document, embed, store with content metadata.
    embedder = db.get_plugin("ollama")
    for doc_id, text in DOCUMENTS.items():
        for i, chunk in enumerate(chunk_text(text, chunk_size=200, overlap=40)):
            emb = await embedder.create_embedding(chunk)
            await db.vector_store_async(
                emb, {"content": chunk, "doc": doc_id}, id=f"{doc_id}-{i}"
            )
    print(f"ingested {db.count_vectors()} chunks")

    answer = await rag_pipeline(db, "How do TPUs multiply matrices?")
    print(f"answer: {answer}")
    await db.shutdown()


if __name__ == "__main__":
    asyncio.run(main())
