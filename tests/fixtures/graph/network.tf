resource "aws_vpc" "main" {
  cidr_block = "10.0.0.0/16"
}

resource "aws_subnet" "a" {
  vpc_id     = aws_vpc.main.id
  cidr_block = "10.0.1.0/24"
}

resource "aws_subnet" "b" {
  vpc_id            = aws_vpc.main.id
  availability_zone = "us-west-2b"
}

resource "aws_security_group" "sg" {
  vpc_id      = aws_vpc.main.id
  description = "managed; see docs.example.com"
}
