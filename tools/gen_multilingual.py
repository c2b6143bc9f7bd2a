#!/usr/bin/env python3
"""Generate the UTF-8/multilingual corpus slice (r10, VERDICT-r9 task 6).

The driver corpus is ASCII-only English fixtures under 5 language LABELS;
this slice keeps the label distribution and doc_id/source structure of a
base sfDir but rewrites `text` with genuinely MULTI-BYTE content per
label — Spanish/French diacritics, German umlauts/eszett, CJK — mixed
with a sprinkle of the original ASCII core vocabulary so stopword,
marker, and quality statistics stay nonzero. Everything is BMP (one
UTF-16 unit per code point), which is the contract the engine's
char-indexed expressions (PolyHash/MinWindowHash/CharNgrams, substr
oracles) share with DuckDB's unicode()/substr; astral-plane text is a
separate (documented) boundary.

Deterministic: text is a pure function of doc_id (python Random(doc_id)).
Non-document tables are copied from the base sfDir so the full loader
surface works against the slice.

Usage: python3 tools/gen_multilingual.py <base_sf_dir> <out_dir>
"""
import os
import random
import shutil
import sys

import duckdb

WORDS = {
    # the original ASCII core vocab (markers + stopwords live here)
    "core": ("the a value data row scan hash sort vector order merge small "
             "window join batch table key query line group column part fast "
             "slow big stream filter agg spark customer").split(),
    "en": ("latency throughput shuffle partition broadcast executor stage "
           "codegen pushdown pruning").split(),
    "es": ("configuración búsqueda línea tamaño añadir año señal métrica "
           "índice partición código más está través número página válido "
           "rápido pequeño".split()),
    "de": ("größe wählen übertragen schlüssel zeile tabelle äußere prüfung "
           "verknüpfung straße müssen zählen görlitz fünf zwölf "
           "außerdem".split()),
    "fr": ("requête données clé colonne contrôle déjà élément fenêtre "
           "numéro référence système première àcôté église être mémoire "
           "résultat".split()),
    "zh": ("数据 查询 表格 行键 哈希 排序 向量 顺序 合并 窗口 连接 批次 "
           "分区 广播 执行器 阶段 代码生成 下推 剪枝 快速 缓慢 流式 过滤 "
           "聚合 客户".split()),
}


def doc_text(doc_id: int, lang: str, approx_words: int) -> str:
    rng = random.Random(doc_id)
    native = WORDS.get(lang, WORDS["en"])
    out = []
    for _ in range(approx_words):
        # ~25% ASCII core vocabulary, 75% native-script words
        pool = WORDS["core"] if rng.random() < 0.25 else native
        out.append(pool[rng.randrange(len(pool))])
    return " ".join(out)


def main():
    base, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    rows = duckdb.sql(
        f"SELECT doc_id, lang, source, n_chars "
        f"FROM '{base}/documents.parquet' ORDER BY doc_id").fetchall()
    gen = []
    for doc_id, lang, source, n_chars in rows:
        # keep roughly the base corpus's size distribution (in words)
        text = doc_text(doc_id, lang, max(20, int(n_chars) // 6))
        gen.append((doc_id, text, lang, source, len(text)))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
                " source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", gen)
    con.execute(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")
    for t in ("region nation customer supplier part orders lineitem events "
              "embeddings").split():
        shutil.copyfile(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    n_multi = sum(1 for r in gen if len(r[1].encode()) != len(r[1]))
    print(f"{out}: {len(gen)} docs, {n_multi} with multi-byte text "
          f"({100.0 * n_multi / len(gen):.0f}%)")


main()
