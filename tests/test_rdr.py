"""RDR tagger + sentence detector tests, mirroring the reference's
NameLikeKeywordsTest / SubjectLikeKeywordsTest
(/root/reference/code/features-convert/keyword-extraction/src/test/java/nu/
 marginalia/keyword/extractors/NameLikeKeywordsTest.java:16-54,
 SubjectLikeKeywordsTest.java:17-63) with the same Julius Caesar text and
the same expected keyword sets."""

from marginalia_ray.stages.rdr import RdrTagger, RdrTree, default_tagger, initial_tag, parse_dict
from marginalia_ray.stages.sentdetect import detect_sentences
from marginalia_ray.stages.sentences import extract_dld
from marginalia_ray.stages.keywords import (
    TfIdfCounts,
    name_like_keywords,
    subject_like_keywords,
)

CAESAR_TEXT = """\
In 60 BC, Caesar, Crassus, and Pompey formed the First Triumvirate, an informal political alliance that
dominated Roman politics for several years. Their attempts to amass power as Populares were opposed by
the Optimates within the Roman Senate, among them Cato the Younger with the frequent support of Cicero.
Caesar rose to become one of the most powerful politicians in the Roman Republic through a string of
military victories in the Gallic Wars, completed by 51 BC, which greatly extended Roman territory.
During this time he both invaded Britain and built a bridge across the Rhine river. These achievements
and the support of his veteran army threatened to eclipse the standing of Pompey, who had realigned himself
with the Senate after the death of Crassus in 53 BC. With the Gallic Wars concluded, the Senate ordered
Caesar to step down from his military command and return to Rome. In 49 BC, Caesar openly defied the
Senate's authority by crossing the Rubicon and marching towards Rome at the head of an army. This
began Caesar's civil war, which he won, leaving him in a position of near unchallenged power and
influence in 45 BC.

After assuming control of government, Caesar began a program of social and governmental reforms,
including the creation of the Julian calendar. He gave citizenship to many residents of far regions
of the Roman Republic. He initiated land reform and support for veterans. He centralized the
bureaucracy of the Republic and was eventually proclaimed "dictator for life" (dictator perpetuo).
His populist and authoritarian reforms angered the elites, who began to conspire against him. On the
Ides of March (15 March) 44 BC, Caesar was assassinated by a group of rebellious senators led by Brutus
and Cassius, who stabbed him to death. A new series of civil wars broke out and the constitutional
government of the Republic was never fully restored. Caesar's great-nephew and adopted heir Octavian,
later known as Augustus, rose to sole power after defeating his opponents in the last civil war of
the Roman Republic. Octavian set about solidifying his power, and the era of the Roman Empire began.
"""


class TestRdrEvaluator:
    def test_tree_structure(self):
        rules = (
            'True : object.conclusion = "NN"\n'
            '\tobject.tag == "NN" : object.conclusion = "NN"\n'
            '\t\tobject.prevTag1 == "TO" : object.conclusion = "VB"\n'
            '\tobject.tag == "VBD" : object.conclusion = "VBD"\n'
            '\t\tobject.prevWord1 == "was" : object.conclusion = "VBN"\n'
        )
        tree = RdrTree(rules)
        # root + 4 rules
        assert len(tree.conclusions) == 5
        # root's exception is the first depth-1 rule; they chain via if-not
        assert tree.except_idx[0] == 1
        assert tree.if_not_idx[1] == 3
        assert tree.except_idx[1] == 2
        assert tree.except_idx[3] == 4

    def test_exception_fires(self):
        tagger = RdrTagger(
            {"to": "TO", "was": "VBD"},
            'True : object.conclusion = "NN"\n'
            '\tobject.tag == "NN" : object.conclusion = "NN"\n'
            '\t\tobject.prevTag1 == "TO" : object.conclusion = "VB"\n'
            '\tobject.tag == "TO" : object.conclusion = "TO"\n'
            '\tobject.tag == "VBD" : object.conclusion = "VBD"\n',
        )
        assert tagger.tag_sentence(["to", "eclipse"]) == ["TO", "VB"]
        assert tagger.tag_sentence(["eclipse"]) == ["NN"]

    def test_initial_tagger_heuristics(self):
        d = parse_dict("'' ''\nthe DT")
        # verbatim InitialTagger behaviors (InitialTagger.java:112-160)
        assert initial_tag("the", d) == "DT"
        assert initial_tag("The", d) == "DT"  # lowercase fallback
        assert initial_tag("Caesar", d) == "NNP"
        assert initial_tag("victories", d) == "NNS"
        assert initial_tag("3.5", d) == "NN"  # url() fires before cd()
        assert initial_tag("1987", d) == "CD"
        assert initial_tag("top-10", d) == "JJ"  # jj1: digit-dash
        assert initial_tag("quickly", d) == "RB"
        assert initial_tag("awareness", d) == "NN"
        assert initial_tag('"', d) == "''"
        assert initial_tag("(", d) == "?"

    def test_default_tagger_contextual(self):
        t = default_tagger()
        # -ed after auxiliary -> VBN; standalone -> VBD
        assert t.tag_sentence(["Pompey", "was", "opposed"]) == ["NNP", "VBD", "VBN"]
        assert t.tag_sentence(["Pompey", "formed", "the", "alliance"])[1] == "VBD"
        # infinitive repair
        assert t.tag_sentence(["to", "amass", "power"])[1] == "VB"
        assert t.tag_sentence(["to", "eclipse", "him"])[1] == "VB"
        # gerund vs determined noun
        assert t.tag_sentence(["by", "crossing", "the", "river"])[1] == "VBG"
        assert t.tag_sentence(["the", "standing", "of", "Pompey"])[1] == "NN"


class TestSentenceDetector:
    def test_basic_split(self):
        s = detect_sentences("First sentence. Second sentence. And a third!")
        assert len(s) == 3

    def test_abbreviations(self):
        s = detect_sentences("Dr. Smith visited St. Paul. He left early.")
        assert len(s) == 2
        assert s[0].startswith("Dr. Smith")

    def test_initials(self):
        s = detect_sentences("J. R. R. Tolkien wrote it. I read it.")
        assert len(s) == 2

    def test_decimals_and_ellipsis(self):
        s = detect_sentences("Pi is 3.14159 about. Math is fun.")
        assert len(s) == 2

    def test_no_boundary_before_lowercase(self):
        s = detect_sentences("visit example.com for more. the end")
        # lowercase opener after '.' is not a boundary
        assert len(s) == 1 or s[0].endswith("more.")


class TestNameLikeKeywords:
    """NameLikeKeywordsTest.java:42-52 mirrored."""

    def test_caesar(self):
        dld = extract_dld(CAESAR_TEXT, "Julius Caesar")
        reps, stemmed = name_like_keywords(dld, min_count=2)
        actual = {w for w, _ in reps}
        expected = {"caesar", "senate", "roman", "republic", "roman_republic"}
        assert actual == expected


class TestSubjectLikeKeywords:
    """SubjectLikeKeywordsTest.java:43-62 mirrored.

    The Java test scores with the trained TermFrequencyDict; here the
    built-in common-English frequency table (functions/term_freq_builtin.py)
    provides the same common-vs-rare separation.
    """

    def test_caesar(self):
        from marginalia_ray.functions.term_freq_builtin import (
            BUILTIN_DOC_COUNT,
            BUILTIN_EN_FREQS,
        )

        dld = extract_dld(CAESAR_TEXT, "Julius Caesar")
        tfidf = TfIdfCounts(dld, BUILTIN_EN_FREQS, BUILTIN_DOC_COUNT)
        reps, stemmed = subject_like_keywords(dld, tfidf)
        actual = {w for w, _ in reps}
        expected = {
            "caesar",
            "republic",
            "authoritarian_reforms",
            "senate",
            "pompey",
            "reforms",
            "government_of_the_republic",
        }
        assert actual == expected


class TestSentenceExtractorReferenceCases:
    """SentenceExtractorTest.java (language-processing tests) asserting
    cases mirrored: testPolishArtist:29-35, testJava:37-43,
    testApostrophe:77-84."""

    def test_polish_artist(self):
        from marginalia_ray.stages.sentences import extract_sentences_from_string

        (s,) = extract_sentences_from_string("Uklański")
        assert list(s.words) == ["Uklanski"]
        assert list(s.words_lc) == ["uklanski"]

    def test_java_ampersand(self):
        from marginalia_ray.stages.sentences import extract_sentences_from_string

        (s,) = extract_sentences_from_string("Foreign Function & Memory API")
        assert list(s.words) == ["Foreign", "Function", "Memory", "API"]

    def test_apostrophe(self):
        from marginalia_ray.stages.sentences import extract_sentences_from_string

        (s,) = extract_sentences_from_string("duke nuke 'em's big ol' big gun")
        assert list(s.words) == ["duke", "nuke", "em's", "big", "ol", "big", "gun"]
        assert list(s.words_lc) == ["duke", "nuke", "em", "big", "ol", "big", "gun"]
