"""BioLemmatizer bridge protocol tests (fake JVM; VERDICT r1 missing #5).

The real jar + JVM are absent from this environment, so these tests
drive the EXACT subprocess protocol (argv shape, batched stdin, tab-
separated stdout parsing, alignment fallback) against a fake ``java``
executable that speaks the jar's output format (reference
remove_words.py:201-219). A behavioral drift in the wrapper now fails a
test instead of only surfacing when someone finally runs the real tool.
"""

import os
import stat

import pytest

from sgc_tpu.textgraph.biolemma import JAR_ENV, lemmatize_bio

FAKE_JAVA = r"""#!/bin/bash
# fake BioLemmatizer: expects -jar <jar> -l -t; echoes token<TAB>lemma PO
if [[ "$*" != *"-jar"* || "$*" != *"-l"* || "$*" != *"-t"* ]]; then
  echo "unexpected argv: $*" >&2
  exit 2
fi
while IFS= read -r tok || [[ -n "$tok" ]]; do
  # "lemma" = token minus a trailing s, like a real lemmatizer would
  printf '%s\t%s NN\n' "$tok" "${tok%s}"
done
"""


@pytest.fixture()
def fake_jvm(tmp_path, monkeypatch):
    java = tmp_path / "java"
    java.write_text(FAKE_JAVA)
    java.chmod(java.stat().st_mode | stat.S_IEXEC)
    jar = tmp_path / "biolemmatizer-core-1.2-jar-with-dependencies.jar"
    jar.write_bytes(b"fake")
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}" + os.environ["PATH"])
    monkeypatch.setenv(JAR_ENV, str(jar))
    return tmp_path


def test_lemmatize_bio_protocol(fake_jvm):
    out = lemmatize_bio(["cells", "proteins", "virus"])
    assert out == ["cell", "protein", "viru"]


def test_lemmatize_bio_batches(fake_jvm):
    toks = [f"word{i}s" for i in range(25)]
    out = lemmatize_bio(toks, batch_size=10)   # 3 subprocess batches
    assert out == [f"word{i}" for i in range(25)]


def test_lemmatize_bio_misaligned_output_falls_back(fake_jvm, tmp_path):
    # a tool that drops lines must trigger the identity fallback, keeping
    # token alignment for the downstream vocab build
    java = tmp_path / "java"
    java.write_text("#!/bin/bash\nread -r tok; printf '%s\\t%s NN\\n' "
                    "\"$tok\" \"$tok\"\n")  # emits only the FIRST line
    toks = ["alpha", "beta", "gamma"]
    out = lemmatize_bio(toks)
    assert out == toks


def test_lemmatize_bio_missing_jar_clear_error(monkeypatch):
    monkeypatch.delenv(JAR_ENV, raising=False)
    with pytest.raises(FileNotFoundError, match=JAR_ENV):
        lemmatize_bio(["x"])
