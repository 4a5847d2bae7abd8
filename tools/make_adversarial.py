#!/usr/bin/env python3
"""Dev tool: build an adversarial testdata dir (documents table with
exact-dup groups, mutation-gradient near-dups, single-token/unicode/
stopword-only docs) to stress the dedup/text oracles beyond the
driver's synthetic corpus. Usage:
    python3 tools/make_adversarial.py /tmp/advsf
    sbt "runMain graft.Verify /tmp/advsf /tmp/vadv"
    python3 tools/check.py /tmp/vadv /tmp/advsf
"""
import pyarrow as pa, pyarrow.parquet as pq
import shutil, os, random, sys

def main(adv: str, base: str = '/root/testdata/sf0.001') -> None:
    shutil.rmtree(adv, ignore_errors=True)
    os.makedirs(adv)
    for f in os.listdir(base):
        if f != 'documents.parquet':
            shutil.copy(f'{base}/{f}', f'{adv}/{f}')
    random.seed(7)
    vocab = "the a spark flink data row batch stream join sort agg key value 数据 café naïve".split()
    docs = []
    def add(text, lang='en', source='adv'):
        docs.append((len(docs), text, lang, source, len(text)))
    for _ in range(120):
        add(' '.join(random.choice(vocab) for _ in range(random.randint(20, 60))))
    for i in range(5):  # exact duplicate groups
        t = ' '.join(random.choice(vocab) for _ in range(30))
        add(t); add(t)
        if i % 2 == 0: add(t)
    for _ in range(10):  # near-dups across the est-threshold boundary
        b = [random.choice(vocab) for _ in range(40)]
        add(' '.join(b))
        m = list(b)
        for _ in range(random.randint(1, 8)):
            m[random.randrange(len(m))] = random.choice(vocab)
        add(' '.join(m))
    add('single')
    add('two tokens')
    add('a a a a a a a a')
    add('the ' * 50 + 'the')
    add('数据 café naïve 数据 café')
    t = pa.table({
        'doc_id': pa.array([d[0] for d in docs], pa.int64()),
        'text': pa.array([d[1] for d in docs], pa.string()),
        'lang': pa.array([d[2] for d in docs], pa.string()),
        'source': pa.array([d[3] for d in docs], pa.string()),
        'n_chars': pa.array([d[4] for d in docs], pa.int64()),
    })
    pq.write_table(t, f'{adv}/documents.parquet')
    print(f'{adv}: {len(docs)} adversarial docs')

if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/advsf')
