# Naming-convention lint corpus: one clean snake_case name, one
# UpperCamel violation, one dash name that also echoes its type (both
# axes at once), one snake name echoing the type suffix.

resource "aws_instance" "web_server" {
  ami           = "ami-00000001"
  instance_type = "t3.micro"
}

resource "aws_instance" "WebServer" {
  ami           = "ami-00000002"
  instance_type = "t3.micro"
}

resource "aws_s3_bucket" "data-bucket" {
  bucket = "acme-data"
}

resource "aws_s3_bucket" "logs_bucket" {
  bucket = "acme-logs"
}
