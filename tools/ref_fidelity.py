#!/usr/bin/env python3
"""Dev tool: validate the text-cleaning pack against the REFERENCE's own
Python semantics (re-implemented here from preprocessing_agent.py:19-152
— pure re.sub chains, no imports from the reference).

Reads the Verify dump for the cleaner queries, rebuilds each decorated
input exactly as TextQueries does, applies the reference-semantics
Python, and diffs. Usage: python3 tools/ref_fidelity.py <sfDir> <outDir>
"""
import re
import sys

import duckdb


def strip(t):
    return t.strip()


def remove_timestamps(t):
    t = re.sub(r'\d{2}:\d{2}:\d{2}[.,]\d{3}\s*-->\s*\d{2}:\d{2}:\d{2}[.,]\d{3}', '', t)
    t = re.sub(r'^\s*\d+\s*$', '', t, flags=re.MULTILINE)
    t = re.sub(r'WEBVTT.*\n?', '', t)
    return t.strip()


def remove_brackets(t):
    t = re.sub(r'\[.*?\]', '', t)
    t = re.sub(r'\(.*?\)', '', t)
    t = re.sub(r'\{.*?\}', '', t)
    return t.strip()


def remove_html(t):
    return re.sub(r'<[^>]+>', '', t).strip()


def remove_speakers(t):
    t = re.sub(r'^[A-Z][A-Z\s]{1,20}:\s*', '', t, flags=re.MULTILINE)
    t = re.sub(r'^\w[\w\s]{1,20}:\s*', '', t, flags=re.MULTILINE)
    t = re.sub(r'<v\s+[^>]+>', '', t)
    return t.strip()


def remove_dialog_punct(t):
    t = re.sub(r'^\s*-+\s*', '', t, flags=re.MULTILINE)
    t = re.sub(r'\.{2,}', '', t)
    t = re.sub(r'-{2,}', '', t)
    t = re.sub(r'["“”\'‘’]+', '', t)
    t = re.sub(r'[!?,;:]+', '', t)
    return t.strip()


def remove_newlines(t):
    t = t.replace('\n', ' ').replace('\r', ' ')
    t = re.sub(r' +', ' ', t)
    return t.strip()


def remove_non_alpha(t):
    return re.sub(r'[^a-zA-Z\s]', '', t).strip()


def remove_fillers(t):
    fillers = (r'\b(um+|uh+|hmm+|hm+|ah+|oh+|er+|erm+|gonna|wanna|gotta|'
               r'kinda|sorta|like|okay|ok|yeah|yep|nope)\b')
    t = re.sub(fillers, '', t, flags=re.IGNORECASE)
    t = re.sub(r' +', ' ', t)
    return t.strip()


def lowercase(t):
    return t.lower()


def normalize_ws(t):
    lines = [re.sub(r' +', ' ', line).strip() for line in t.split('\n')]
    return ' '.join(line for line in lines if line)


CLEANERS = {
    "o15_remove_timestamps": [remove_timestamps],
    "o16_remove_brackets": [remove_brackets],
    "o17_remove_html": [remove_html],
    "o18_remove_speakers": [remove_speakers],
    "o19_remove_dialog_punct": [remove_dialog_punct],
    "o20_remove_newlines": [remove_newlines],
    "o21_remove_non_alpha": [remove_non_alpha],
    "o22_remove_fillers": [remove_fillers],
    "o23_lowercase": [lowercase],
    "o24_normalize_ws": [normalize_ws],
    "q_clean_subtitles": [remove_timestamps, remove_brackets, remove_html,
                          remove_speakers, remove_dialog_punct,
                          remove_newlines, remove_non_alpha, remove_fillers,
                          lowercase, normalize_ws],
}


def decorate(doc_id, text):
    return ("WEBVTT\n12\n00:01:23,456 --> 00:01:25,789\n"
            "[applause] (laughs) {music}\n"
            "JOHN: <i>Hello there...</i> -- \"quoted\" don’t\n"
            "<v Narrator>once upon a time\n"
            "- um Uh GONNA line one, okay!?\n"
            f"{text}\nJohn Smith: ep {doc_id} trailing;:")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").fetchall()
    total_bad = 0
    for qname, fns in CLEANERS.items():
        spark = dict(con.execute(
            f"SELECT doc_id, cleaned FROM '{out_dir}/{qname}/*.parquet'").fetchall())
        bad = 0
        for doc_id, text in docs:
            expect = decorate(doc_id, text)
            for f in fns:
                expect = f(expect)
            if spark.get(doc_id) != expect:
                bad += 1
                if bad == 1:
                    print(f"  {qname} doc {doc_id}:")
                    print(f"    ref  : {expect[:120]!r}")
                    print(f"    spark: {spark.get(doc_id, '')[:120]!r}")
        total_bad += bad
        print(f"{qname:28s} {'OK' if bad == 0 else f'{bad} MISMATCHES'}")
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
