package graft.sources

/** Bundled public-suffix list — the registrable-domain (eTLD+1)
  * dimension behind `graft_urldomain` and every per-site grouping
  * (domain caps, domain reports, robots attribution). The same
  * curated-dimension discipline as [[CountryDim]]: offline,
  * versioned-in-code, oracle-adjacent, swappable by a data edit.
  *
  * The rule text below is a knowledge-derived snapshot SUBSET of the
  * publicsuffix.org list (public data, Mozilla-maintained): every
  * ccTLD second-level registry family in common crawl traffic
  * (co.uk-style), the wildcard ccTLDs with their exception rules, the
  * US state / Canadian province hierarchies, and the big PaaS site
  * domains from the private section. It is deliberately NOT the full
  * 9k-line file — this build environment is offline — but the PARSER
  * implements the full publicsuffix.org algorithm (longest match,
  * `*.` wildcard rules, `!` exception rules, implicit `*` default),
  * so swapping in the complete upstream file is a paste, not a code
  * change.
  *
  * Semantics (publicsuffix.org algorithm):
  *  - a rule matches when the host's labels end with the rule's
  *    labels; `*` matches exactly one label;
  *  - an exception rule (`!`) beats all others — the public suffix is
  *    the exception rule minus its leftmost label;
  *  - otherwise the longest (most labels) matching rule is the public
  *    suffix; no match → the TLD alone (implicit `*` rule);
  *  - registrable domain = public suffix + one label. A host that IS
  *    a public suffix (or a single label, e.g. `localhost`) returns
  *    itself — conservative for grouping keys: such hosts group alone
  *    rather than vanishing into null.
  */
object PublicSuffix {

  /** PSL-format rules: one per line, `//` comments, `*.` wildcards,
    * `!` exceptions. Single-label TLDs are implicit (the algorithm's
    * default `*` rule) and omitted.
    */
  val listText: String = """
// ---- ICANN section (ccTLD second-level registries) ----
// United Kingdom
ac.uk
co.uk
gov.uk
ltd.uk
me.uk
net.uk
nhs.uk
org.uk
plc.uk
police.uk
sch.uk
// Ireland
gov.ie
// Australia
asn.au
com.au
edu.au
gov.au
id.au
net.au
org.au
// New Zealand
ac.nz
co.nz
geek.nz
gen.nz
govt.nz
iwi.nz
kiwi.nz
maori.nz
net.nz
org.nz
school.nz
// Japan
ac.jp
ad.jp
co.jp
ed.jp
go.jp
gr.jp
lg.jp
ne.jp
or.jp
// South Korea
ac.kr
co.kr
es.kr
go.kr
hs.kr
kg.kr
mil.kr
ms.kr
ne.kr
or.kr
pe.kr
re.kr
sc.kr
// China
ac.cn
com.cn
edu.cn
gov.cn
mil.cn
net.cn
org.cn
// Taiwan
club.tw
com.tw
ebiz.tw
edu.tw
game.tw
gov.tw
idv.tw
mil.tw
net.tw
org.tw
// Hong Kong
com.hk
edu.hk
gov.hk
idv.hk
net.hk
org.hk
// Singapore
com.sg
edu.sg
gov.sg
net.sg
org.sg
per.sg
// Malaysia
com.my
edu.my
gov.my
mil.my
name.my
net.my
org.my
// Indonesia
ac.id
biz.id
co.id
desa.id
go.id
mil.id
my.id
net.id
or.id
ponpes.id
sch.id
web.id
// Thailand
ac.th
co.th
go.th
in.th
mi.th
net.th
or.th
// Vietnam
ac.vn
biz.vn
com.vn
edu.vn
gov.vn
health.vn
info.vn
int.vn
name.vn
net.vn
org.vn
pro.vn
// Philippines
com.ph
edu.ph
gov.ph
i.ph
mil.ph
net.ph
ngo.ph
org.ph
// India
ac.in
co.in
edu.in
firm.in
gen.in
gov.in
ind.in
mil.in
net.in
nic.in
org.in
res.in
// Pakistan
biz.pk
com.pk
edu.pk
fam.pk
gob.pk
gov.pk
net.pk
org.pk
web.pk
// Sri Lanka
ac.lk
assn.lk
com.lk
edu.lk
gov.lk
grp.lk
hotel.lk
int.lk
ltd.lk
net.lk
ngo.lk
org.lk
sch.lk
soc.lk
web.lk
// Brazil
adv.br
art.br
blog.br
com.br
coop.br
eco.br
edu.br
emp.br
eng.br
esp.br
etc.br
eti.br
far.br
flog.br
fnd.br
fot.br
g12.br
gov.br
imb.br
ind.br
inf.br
jor.br
jus.br
leg.br
med.br
mil.br
mus.br
net.br
nom.br
not.br
ntr.br
odo.br
org.br
ppg.br
pro.br
psc.br
psi.br
qsl.br
radio.br
rec.br
slg.br
srv.br
taxi.br
teo.br
tmp.br
trd.br
tur.br
tv.br
vet.br
vlog.br
wiki.br
zlg.br
// Mexico
com.mx
edu.mx
gob.mx
net.mx
org.mx
// Argentina
com.ar
edu.ar
gob.ar
gov.ar
int.ar
mil.ar
musica.ar
net.ar
org.ar
tur.ar
// Colombia
com.co
edu.co
gov.co
mil.co
net.co
nom.co
org.co
// Chile
gob.cl
gov.cl
mil.cl
// Peru
com.pe
edu.pe
gob.pe
mil.pe
net.pe
nom.pe
org.pe
// Venezuela
co.ve
com.ve
edu.ve
gob.ve
info.ve
mil.ve
net.ve
org.ve
web.ve
// Uruguay
com.uy
edu.uy
gub.uy
mil.uy
net.uy
org.uy
// Ecuador
com.ec
edu.ec
fin.ec
gob.ec
gov.ec
info.ec
k12.ec
med.ec
mil.ec
net.ec
org.ec
pro.ec
// Bolivia
com.bo
edu.bo
gob.bo
int.bo
mil.bo
net.bo
org.bo
tv.bo
web.bo
// Paraguay
com.py
coop.py
edu.py
gov.py
mil.py
net.py
org.py
// South Africa
ac.za
co.za
edu.za
gov.za
law.za
mil.za
net.za
ngo.za
nom.za
org.za
school.za
web.za
// Nigeria
com.ng
edu.ng
gov.ng
i.ng
mil.ng
mobi.ng
name.ng
net.ng
org.ng
sch.ng
// Kenya
ac.ke
co.ke
go.ke
info.ke
me.ke
mobi.ke
ne.ke
or.ke
sc.ke
// Egypt
com.eg
edu.eg
eun.eg
gov.eg
mil.eg
name.eg
net.eg
org.eg
sci.eg
// Morocco
ac.ma
co.ma
gov.ma
net.ma
org.ma
press.ma
// Ghana
com.gh
edu.gh
gov.gh
mil.gh
org.gh
// Tanzania
ac.tz
co.tz
go.tz
hotel.tz
info.tz
me.tz
mil.tz
mobi.tz
ne.tz
or.tz
sc.tz
tv.tz
// Uganda
ac.ug
co.ug
com.ug
go.ug
ne.ug
or.ug
org.ug
sc.ug
// Zimbabwe
ac.zw
co.zw
gov.zw
mil.zw
org.zw
// Israel
ac.il
co.il
gov.il
idf.il
k12.il
muni.il
net.il
org.il
// Turkey
av.tr
bbs.tr
bel.tr
biz.tr
com.tr
dr.tr
edu.tr
gen.tr
gov.tr
info.tr
k12.tr
name.tr
net.tr
org.tr
pol.tr
tel.tr
tsk.tr
tv.tr
web.tr
// Saudi Arabia
com.sa
edu.sa
gov.sa
med.sa
net.sa
org.sa
pub.sa
sch.sa
// United Arab Emirates
ac.ae
co.ae
gov.ae
mil.ae
net.ae
org.ae
sch.ae
// Iran
ac.ir
co.ir
gov.ir
id.ir
net.ir
org.ir
sch.ir
// Russia (legacy second-level registries)
ac.ru
com.ru
edu.ru
gov.ru
int.ru
mil.ru
msk.ru
net.ru
org.ru
pp.ru
spb.ru
// Ukraine
com.ua
dp.ua
edu.ua
gov.ua
in.ua
kharkiv.ua
kiev.ua
kyiv.ua
lviv.ua
net.ua
odessa.ua
org.ua
// Poland
biz.pl
com.pl
edu.pl
gov.pl
info.pl
mil.pl
net.pl
org.pl
sklep.pl
waw.pl
// Spain
com.es
edu.es
gob.es
nom.es
org.es
// France
aeroport.fr
asso.fr
avocat.fr
com.fr
gouv.fr
nom.fr
prd.fr
tm.fr
// Portugal
com.pt
edu.pt
gov.pt
int.pt
net.pt
nome.pt
org.pt
publ.pt
// Greece
com.gr
edu.gr
gov.gr
net.gr
org.gr
// Italy
edu.it
gov.it
// Romania
arts.ro
com.ro
firm.ro
info.ro
nom.ro
nt.ro
org.ro
rec.ro
store.ro
tm.ro
www.ro
// Hungary
2000.hu
co.hu
info.hu
org.hu
priv.hu
sport.hu
tm.hu
// Austria
ac.at
co.at
gv.at
or.at
// Belgium
ac.be
// Norway
mil.no
priv.no
// Iceland
net.is
gov.is
// Wildcard ccTLDs (every second level is a registry) + exceptions
*.bd
*.ck
!www.ck
*.er
*.fk
*.jm
*.kh
*.mm
*.np
*.pg
// Canada (provinces/territories + federal)
ab.ca
bc.ca
gc.ca
mb.ca
nb.ca
nf.ca
nl.ca
ns.ca
nt.ca
nu.ca
on.ca
pe.ca
qc.ca
sk.ca
yk.ca
// United States (state hierarchies)
ak.us
al.us
ar.us
az.us
ca.us
co.us
ct.us
dc.us
de.us
fl.us
ga.us
hi.us
ia.us
id.us
il.us
in.us
ks.us
ky.us
la.us
ma.us
md.us
me.us
mi.us
mn.us
mo.us
ms.us
mt.us
nc.us
nd.us
ne.us
nh.us
nj.us
nm.us
nv.us
ny.us
oh.us
ok.us
or.us
pa.us
ri.us
sc.us
sd.us
tn.us
tx.us
ut.us
va.us
vt.us
wa.us
wi.us
wv.us
wy.us
// ---- Private section (PaaS site domains) ----
amazonaws.com
s3.amazonaws.com
compute.amazonaws.com
elb.amazonaws.com
appspot.com
azurestaticapps.net
azurewebsites.net
blogspot.ca
blogspot.co.uk
blogspot.com
blogspot.com.ar
blogspot.com.au
blogspot.com.br
blogspot.de
blogspot.fr
blogspot.in
blogspot.jp
blogspot.kr
blogspot.mx
cloudfront.net
cloudfunctions.net
firebaseapp.com
github.io
githubusercontent.com
gitlab.io
glitch.me
herokuapp.com
myshopify.com
neocities.org
netlify.app
ngrok.io
onrender.com
pages.dev
readthedocs.io
repl.co
surge.sh
vercel.app
web.app
workers.dev
wpenginepowered.com
"""

  private val (exactRules, wildcardBases, exceptionRules):
      (Set[String], Set[String], Set[String]) = {
    val lines = listText.split("\n", -1).iterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toSeq
    val ex = lines.filter(_.startsWith("!")).map(_.substring(1)).toSet
    val wc = lines.filter(_.startsWith("*.")).map(_.substring(2)).toSet
    val pl = lines.filterNot(l => l.startsWith("!") || l.startsWith("*."))
      .toSet
    (pl, wc, ex)
  }

  /** Number of labels in the host's public suffix (host must already
    * be lowercased, no trailing dot). Implicit default: 1 (the TLD).
    */
  def publicSuffixLabels(labels: Array[String]): Int =
    publicSuffixMatch(labels)._1

  /** The suffix-label count AND the KIND of rule that decided it —
    * "exception" / "exact" / "wildcard" / "default" (the implicit `*`
    * rule: nothing in the list matched beyond the bare TLD). The kind
    * makes bundled-subset fallback OBSERVABLE (round 16 — VERDICT r15
    * task 7): a host bucketed by the default rule on an unlisted
    * registry (e.g. a ccTLD second-level this snapshot lacks) is
    * indistinguishable from a correct match without it. Length
    * semantics are IDENTICAL to the pre-split `publicSuffixLabels`;
    * a same-length listed rule upgrades the kind without moving the
    * boundary.
    */
  def publicSuffixMatch(labels: Array[String]): (Int, String) = {
    val n = labels.length
    var best = 1
    var kind = "default"
    var i = n - 1
    var cand = labels(n - 1)
    while (i >= 0) {
      // cand = labels[i..n) joined; built right-to-left incrementally.
      if (exceptionRules.contains(cand)) return (n - i - 1, "exception")
      if (exactRules.contains(cand)) {
        if (n - i > best) { best = n - i; kind = "exact" }
        else if (n - i == best && kind == "default") kind = "exact"
      }
      if (i >= 1 && wildcardBases.contains(cand)) {
        if (n - i + 1 > best) { best = n - i + 1; kind = "wildcard" }
        else if (n - i + 1 == best && kind == "default") kind = "wildcard"
      }
      i -= 1
      if (i >= 0) cand = labels(i) + "." + cand
    }
    (best, kind)
  }

  /** The rule kind [[registrable]] used for this host — single-label
    * hosts never consult the list ("default").
    */
  def ruleKind(host: String): String = {
    val labels = host.split("\\.", -1)
    if (labels.length <= 1) "default"
    else publicSuffixMatch(labels)._2
  }

  /** Registrable domain (public suffix + 1 label); a host that is
    * itself a public suffix — or a single label — returns itself.
    */
  def registrable(host: String): String = {
    val labels = host.split("\\.", -1)
    val n = labels.length
    if (n <= 1) return host
    val ps = publicSuffixLabels(labels)
    if (n <= ps) host
    else labels.slice(n - ps - 1, n).mkString(".")
  }
}
