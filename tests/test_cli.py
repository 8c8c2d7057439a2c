"""End-to-end CLI tests — the reference's golden stdout/stderr contract.

Mirrors /root/reference/tests/test_search.py: stdout carries the CSV,
stderr the human report; artifacts are created under the reference
filename conventions. Reference testdata is read-only, so fixtures are
copied into a tmp dir first.
"""

import csv
import io
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GOLDEN_STITCH_CSV = '''match_name,query_name,query_start,query_end,query,match_start,match_end,match,encoded,length
sp|Q12982|BNIP2_HUMAN BCL2/adenovirus E1B 19 kDa protein-interacting protein 2 OS=Homo sapiens OX=9606 GN=BNIP2 PE=1 SV=1,sp|P41958|CED9_CAEEL Apoptosis regulator ced-9 OS=Caenorhabditis elegans OX=6239 GN=ced-9 PE=1 SV=1,76,108,RLDIEGFVVDYFTHRILFVYTSLFIKTRIRNN,23,55,SIEADILAITGPEDQPLLAVTRPFISSKFSQK,phphphhhhphhppphhhhhpphhhppphppp,32
sp|Q13625|ASPP2_HUMAN Apoptosis-stimulating of p53 protein 2 OS=Homo sapiens OX=9606 GN=TP53BP2 PE=1 SV=2,sp|P41958|CED9_CAEEL Apoptosis regulator ced-9 OS=Caenorhabditis elegans OX=6239 GN=ced-9 PE=1 SV=1,241,257,KVGRRKQNRRWSMIGA,1084,1100,TIIHREDEDEIEWWWA,phhppppppphphhhh,16
sp|Q16611|BAK_HUMAN Bcl-2 homologous antagonist/killer OS=Homo sapiens OX=9606 GN=BAK1 PE=1 SV=1,sp|P41958|CED9_CAEEL Apoptosis regulator ced-9 OS=Caenorhabditis elegans OX=6239 GN=ced-9 PE=1 SV=1,245,261,RKQNRRWSMIGAGVTA,42,58,HQQEQEAEGVAAPADP,pppppphphhhhhhph,16
"sp|Q9BXH1|BBC3_HUMAN Bcl-2-binding component 3, isoforms 1/2 OS=Homo sapiens OX=9606 GN=BBC3 PE=1 SV=1",sp|P41958|CED9_CAEEL Apoptosis regulator ced-9 OS=Caenorhabditis elegans OX=6239 GN=ced-9 PE=1 SV=1,170,187,LIGLISFGGFVAAKMME,46,63,APAAPTLLPAAYLCAPT,hhhhhphhhhhhhphhp,17
sp|Q9UK96|FBX10_HUMAN F-box only protein 10 OS=Homo sapiens OX=9606 GN=FBXO10 PE=1 SV=3,sp|P41958|CED9_CAEEL Apoptosis regulator ced-9 OS=Caenorhabditis elegans OX=6239 GN=ced-9 PE=1 SV=1,59,92,MSIGESIDGKINDWEEPGIVGVVVCGRMMFSLK,57,90,PNWPNQPDVEPESWREAAGIYILYHGNPVVSGN,hphhpphphphpphpphhhhhhhhphphhhphp,33
'''

GOLDEN_REPORT_SNIPPET = """---
Query Name: sp|P41958|CED9_CAEEL Apoptosis regulator ced-9 OS=Caenorhabditis elegans OX=6239 GN=ced-9 PE=1 SV=1
Match Name: sp|Q9UK96|FBX10_HUMAN F-box only protein 10 OS=Homo sapiens OX=9606 GN=FBXO10 PE=1 SV=3
query: MSIGESIDGKINDWEEPGIVGVVVCGRMMFSLK (59-92)
alpha: hphhpphphphpphpphhhhhhhhphphhhphp
match: PNWPNQPDVEPESWREAAGIYILYHGNPVVSGN (57-90)

---
Query Name: sp|P41958|CED9_CAEEL Apoptosis regulator ced-9 OS=Caenorhabditis elegans OX=6239 GN=ced-9 PE=1 SV=1
Match Name: sp|Q12982|BNIP2_HUMAN BCL2/adenovirus E1B 19 kDa protein-interacting protein 2 OS=Homo sapiens OX=9606 GN=BNIP2 PE=1 SV=1
query: RLDIEGFVVDYFTHRILFVYTSLFIKTRIRNN (76-108)
alpha: phphphhhhphhppphhhhhpphhhppphppp
match: SIEADILAITGPEDQPLLAVTRPFISSKFSQK (23-55)

---
Query Name: sp|P41958|CED9_CAEEL Apoptosis regulator ced-9 OS=Caenorhabditis elegans OX=6239 GN=ced-9 PE=1 SV=1
Match Name: sp|Q9BXH1|BBC3_HUMAN Bcl-2-binding component 3, isoforms 1/2 OS=Homo sapiens OX=9606 GN=BBC3 PE=1 SV=1
query: LIGLISFGGFVAAKMME (170-187)
alpha: hhhhhphhhhhhhphhp
match: APAAPTLLPAAYLCAPT (46-63)

---
Query Name: sp|P41958|CED9_CAEEL Apoptosis regulator ced-9 OS=Caenorhabditis elegans OX=6239 GN=ced-9 PE=1 SV=1
Match Name: sp|Q13625|ASPP2_HUMAN Apoptosis-stimulating of p53 protein 2 OS=Homo sapiens OX=9606 GN=TP53BP2 PE=1 SV=2
query: KVGRRKQNRRWSMIGA (241-257)
alpha: phhppppppphphhhh
match: TIIHREDEDEIEWWWA (1084-1100)

---
Query Name: sp|P41958|CED9_CAEEL Apoptosis regulator ced-9 OS=Caenorhabditis elegans OX=6239 GN=ced-9 PE=1 SV=1
Match Name: sp|Q16611|BAK_HUMAN Bcl-2 homologous antagonist/killer OS=Homo sapiens OX=9606 GN=BAK1 PE=1 SV=1
query: RKQNRRWSMIGAGVTA (245-261)
alpha: pppppphphhhhhhph
match: HQQEQEAEGVAAPADP (42-58)"""


@pytest.fixture
def workdir(tmp_path, ced9, bcl2_first25):
    ced9_local = tmp_path / "ced9.fasta"
    bcl2_local = tmp_path / os.path.basename(bcl2_first25)
    shutil.copy(ced9, ced9_local)
    shutil.copy(bcl2_first25, bcl2_local)
    return tmp_path, str(ced9_local), str(bcl2_local)


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # drop the axon TPU sitecustomize: its plugin registration adds a
    # ~20 s tunnel handshake per subprocess even when forced to CPU
    extra = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([REPO, *extra])
    return subprocess.run(
        [sys.executable, "-m", "kmerseek_tpu.main", *args],
        capture_output=True,
        text=True,
        cwd=cwd,
        env=env,
    )


def test_search_cli(workdir):
    """Reference tests/test_search.py::test_search (plain CSV passthrough)."""
    tmp, ced9, bcl2 = workdir
    result = _run(["search", "--ksize", "16", ced9, bcl2], tmp)
    assert result.returncode == 0, result.stderr
    assert os.path.exists(f"{ced9}.hp.k16.scaled5.sig.zip")
    assert os.path.exists(f"{bcl2}.hp.k16.scaled5.sig.zip")
    lines = result.stdout.strip().splitlines()
    rows = list(csv.DictReader(io.StringIO(result.stdout)))
    assert lines[0].startswith("query_name,query_md5,match_name")
    assert len(rows) == 5
    by_tag = {r["match_name"].split("|")[2].split("_")[0]: r for r in rows}
    assert by_tag["FBX10"]["containment"] == "0.061224489795918366"
    assert by_tag["FBX10"]["intersect_hashes"] == "3"
    assert by_tag["BNIP2"]["query_containment_ani"] == "0.9355328459682174"
    assert by_tag["BBC3"]["match_md5"] == "1d49aa1205276b9ba0176c6680cacd6d"


def test_search_cli_extract_kmers(workdir):
    """Reference tests/test_search.py::test_search_extract_kmers —
    exact stitched CSV on stdout + exact report on stderr."""
    tmp, ced9, bcl2 = workdir
    result = _run(
        ["search", "--extract-kmers", "--ksize", "16", ced9, bcl2], tmp
    )
    assert result.returncode == 0, result.stderr

    got = sorted(csv.reader(io.StringIO(result.stdout)))
    want = sorted(csv.reader(io.StringIO(GOLDEN_STITCH_CSV)))
    assert got == want

    assert GOLDEN_REPORT_SNIPPET in result.stderr


def test_index_cli(workdir):
    tmp, _ced9, bcl2 = workdir
    result = _run(["index", "--ksize", "16", bcl2], tmp)
    assert result.returncode == 0, result.stderr
    sig = f"{bcl2}.hp.k16.scaled5.sig.zip"
    assert os.path.exists(sig)
    assert os.path.isdir(f"{sig}.ksx")
    # artifact reuse: second run must not fail and should reuse
    result2 = _run(["index", "--ksize", "16", bcl2], tmp)
    assert result2.returncode == 0, result2.stderr


def test_index_cli_invalid_input(workdir, tmp_path):
    bad = tmp_path / "bad.fasta"
    bad.write_text(">s1\nPLANT1MES\n")
    result = _run(["index", str(bad)], tmp_path)
    assert result.returncode != 0
    assert "Invalid amino acid" in result.stderr


def test_index_cli_missing_file(tmp_path):
    result = _run(["index", str(tmp_path / "nope.fasta")], tmp_path)
    assert result.returncode != 0


def test_search_cli_no_matches(workdir, tmp_path):
    """A query sharing nothing with the target must emit an empty
    result cleanly (header-only CSV, no crash)."""
    tmp, _ced9, bcl2 = workdir
    q = tmp_path / "nomatch.fasta"
    # poly-W has no hp k16 hashes shared with anything realistic at scaled5
    q.write_text(">weird\n" + "WC" * 200 + "\n")
    result = _run(["search", "--ksize", "16", str(q), bcl2], tmp)
    assert result.returncode == 0, result.stderr
    lines = [l for l in result.stdout.splitlines() if l.strip()]
    assert lines[0].startswith("query_name,")


def test_top_level_api():
    import kmerseek_tpu

    assert kmerseek_tpu.ProteomeIndex.__name__ == "ProteomeIndex"
    assert callable(kmerseek_tpu.manysearch)


def test_index_cli_profile_flag(workdir):
    tmp, ced9, _bcl2 = workdir
    prof = os.path.join(tmp, "trace")
    result = _run(
        ["index", "--ksize", "5", "--scaled", "1", "--moltype", "protein",
         "--profile", prof, ced9],
        tmp,
    )
    assert result.returncode == 0, result.stderr
    assert os.path.isdir(prof)


def test_search_cli_annotate_domains(workdir, tmp_path):
    """--annotate-domains completes the reference's unfinished
    show_results path: a BCL2_HUMAN self-match must log its UniProt
    domain features from the local XML fixture."""
    tmp, _ced9, bcl2 = workdir
    xml = (
        "/root/reference/tests/testdata/index/"
        "uniprotkb_gene_bcl2_AND_reviewed_true_2025_06_04.xml"
    )
    if not os.path.exists(xml):
        import pytest

        pytest.skip("UniProt XML fixture unavailable")
    # single-record FASTA: BCL2_HUMAN only (fast self-search)
    from kmerseek_tpu.core.fasta import read_fasta

    rec = next(r for r in read_fasta(bcl2) if "P10415" in r.name)
    solo = os.path.join(tmp, "bcl2_human.fasta")
    with open(solo, "w") as f:
        f.write(f">{rec.name}\n{rec.seq.decode()}\n")
    result = _run(
        [
            "search", "--extract-kmers", "--ksize", "16",
            "--annotate-domains", xml, solo, solo,
        ],
        tmp,
    )
    assert result.returncode == 0, result.stderr
    assert "Found: Disordered in 38-85" in result.stderr


def test_index_cli_side_artifacts(workdir):
    """Observable side files of `index` (reference tests/test_index.py:
    14-33): the manysketch helper CSV and the siglist file, byte-exact."""
    tmp, _ced9, bcl2 = workdir
    result = _run(["index", "--ksize", "16", "--force", bcl2], tmp)
    assert result.returncode == 0, result.stderr
    with open(f"{bcl2}.manysketch.csv") as f:
        assert f.readlines() == [
            "name,genome_filename,protein_filename\n",
            f"{os.path.basename(bcl2)},,{bcl2}\n",
        ]
    sig = f"{bcl2}.hp.k16.scaled5.sig.zip"
    with open(f"{sig}.siglist") as f:
        assert f.readlines() == [sig]  # no trailing newline


def test_annotate_domains_requires_extract_kmers(workdir):
    tmp, ced9, bcl2 = workdir
    result = _run(
        ["search", "--annotate-domains", "/tmp/x.xml", ced9, bcl2], tmp
    )
    assert result.returncode != 0
    assert "requires --extract-kmers" in result.stderr + result.stdout


def test_index_cli_engine_flag(tmp_path, bcl2_first25):
    """--engine native and --engine device produce identical artifacts."""
    import shutil

    from kmerseek_tpu.core.index import ProteomeIndex

    dirs = {}
    for eng in ("native", "device"):
        d = tmp_path / eng
        d.mkdir()
        fasta = d / "bcl2.fasta.gz"
        shutil.copy(bcl2_first25, fasta)
        r = _run(
            ["index", str(fasta), "--ksize", "16", "--engine", eng],
            cwd=d,
        )
        assert r.returncode == 0, r.stderr[-500:]
        (ksx,) = [p for p in d.iterdir() if p.name.endswith(".ksx")]
        dirs[eng] = ksx
    a = ProteomeIndex.load(str(dirs["native"]))
    b = ProteomeIndex.load(str(dirs["device"]))
    assert a.is_equivalent_to(b)
